"""TPU check+bench of the persistent LSTM kernels at SumGAN shapes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from summarizer_tpu.nn import rnn_lean, rnn_pallas

def bench(f, *a, n=5):
    r = f(*a); float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / n

for (s, b, t, d, h, cd) in [
    (1, 20, 640, 2048, 2048, jnp.bfloat16),   # eLSTM layer1
    (2, 20, 640, 1024, 1024, jnp.bfloat16),   # sLSTM layer0 (bidir)
    (1, 32, 640, 2048, 2048, jnp.bfloat16),   # aligned batch
    (1, 20, 640, 2048, 2048, jnp.float32),    # f32 policy
]:
    rng = np.random.RandomState(0)
    w_ih = jnp.asarray(rng.randn(s, d, 4 * h) * 0.05, cd)
    w_hh = jnp.asarray(rng.randn(s, h, 4 * h) * 0.05, cd)
    bias = jnp.asarray(rng.randn(s, 4 * h) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(s, b, t, d) * 0.1, jnp.float32)

    xg = (jnp.einsum("sbti,sio->sbto", x.astype(cd), w_ih,
                     preferred_element_type=jnp.float32) + bias[:, None, None, :]).astype(cd)
    xg_t = jnp.swapaxes(xg, 1, 2)

    f_scan = jax.jit(lambda wi, wh, bb, xx: rnn_lean._layer_fwd_impl(wi, wh, bb, xx))
    f_pl = jax.jit(lambda xgt, wh: rnn_pallas.lstm_scan_fwd(xgt, wh))

    hs_ref, cs_ref, _ = f_scan(w_ih, w_hh, bias, x)
    _, hs, cs = f_pl(xg_t, w_hh)
    err = float(jnp.max(jnp.abs(jnp.swapaxes(hs, 1, 2) - hs_ref)))
    t_scan = bench(f_scan, w_ih, w_hh, bias, x)
    t_pl = bench(f_pl, xg_t, w_hh)
    print(f"S={s} B={b} T={t} H={h} {cd.__name__:9s} scan {t_scan*1e3:7.2f}ms "
          f"pallas {t_pl*1e3:7.2f}ms  {t_scan/t_pl:4.2f}x  err={err:.2e}")

# backward
s, b, t, d, h, cd = 1, 20, 640, 2048, 2048, jnp.bfloat16
rng = np.random.RandomState(1)
w_hh = jnp.asarray(rng.randn(s, h, 4 * h) * 0.05, cd)
zs = jnp.asarray(rng.randn(s, t, b, 4 * h) * 0.5, cd)
cs = jnp.asarray(rng.randn(s, t, b, h) * 0.5, cd)
dhs = jnp.asarray(rng.randn(s, t, b, h), jnp.float32)
dcs = jnp.asarray(rng.randn(s, t, b, h) * 0.1, jnp.float32)
f_bwd = jax.jit(lambda *a: rnn_pallas.lstm_scan_bwd(*a))
tb = bench(f_bwd, zs, cs, dhs, dcs, w_hh)
print(f"bwd pallas S={s} B={b} T={t} H={h}: {tb*1e3:.2f}ms")
