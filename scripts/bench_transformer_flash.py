"""Transformer scorer at LOL scale: dense vs flash self-attention.

Measures a supervised train step (fwd+bwd+Adam) over the 6-layer/8-head
scorer at T≈3.2k (the LOL regime after 15x subsampling), batch 4 — the
configuration where the dense path materializes 8 heads x T^2 probs
(~330 MB/layer/direction) and the Pallas path streams O(T·block) blocks.

Usage: python scripts/bench_transformer_flash.py [T] [B]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 3200
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp
    import numpy as np

    from summarizer_tpu.models import transformer
    from summarizer_tpu.train.optim import torch_adam
    from summarizer_tpu.train.supervised import make_epoch_fn

    print(f"devices: {jax.devices()}  T={t} B={b}", flush=True)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, t, 1024), jnp.float32)
    targets = jnp.asarray(rng.rand(b, t), jnp.float32)
    mask = jnp.ones((b, t), jnp.float32)
    perm = jnp.arange(b)
    key = jax.random.PRNGKey(0)

    for name, flash in (("dense", 0), ("flash", 1)):
        hp = {"input_size": 1024, "flash": flash}
        params = transformer.init(jax.random.PRNGKey(0), hp)
        opt = torch_adam(5e-5, 1e-5)
        opt_state = opt.init(params)
        epoch_fn = make_epoch_fn(transformer.apply, hp, opt, True, b)
        t0 = time.perf_counter()
        p2, o2, loss = epoch_fn(params, opt_state, feats, targets, mask, perm, key)
        jax.block_until_ready(loss)
        compile_s = time.perf_counter() - t0
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            p2, o2, loss = epoch_fn(p2, o2, feats, targets, mask, perm, key)
        float(loss)
        dt = (time.perf_counter() - t0) / reps
        print(
            f"{name}: {dt * 1e3:.1f} ms/step ({b} videos) "
            f"{b / dt:.2f} videos/s  compile {compile_s:.1f}s loss={float(loss):.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
