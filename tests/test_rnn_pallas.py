"""Parity of the persistent-weight Pallas LSTM scan vs the XLA scan
(interpret mode on CPU; the real kernel is exercised on TPU by bench/train).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarizer_tpu.nn import rnn_lean, rnn_pallas


def _mk(s=2, b=4, t=6, d=8, h=8, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    w_ih = jnp.asarray(rng.randn(s, d, 4 * h) * 0.2, dtype)
    w_hh = jnp.asarray(rng.randn(s, h, 4 * h) * 0.2, dtype)
    bias = jnp.asarray(rng.randn(s, 4 * h) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(s, b, t, d), jnp.float32)
    return w_ih, w_hh, bias, x


def _xg(w_ih, bias, x, cd):
    xg = (
        jnp.einsum("sbti,sio->sbto", x.astype(cd), w_ih.astype(cd),
                   preferred_element_type=jnp.float32)
        + bias[:, None, None, :]
    ).astype(cd)
    return jnp.swapaxes(xg, 1, 2)  # (S, T, B, 4H) time-major


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fwd_matches_scan(dtype):
    w_ih, w_hh, bias, x = _mk(dtype=dtype)
    hs_ref, cs_ref, zs_ref = rnn_lean._layer_fwd_impl(w_ih, w_hh, bias, x)
    zs, hs, cs = rnn_pallas.lstm_scan_fwd(_xg(w_ih, bias, x, dtype), w_hh.astype(dtype))
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(hs), 1, 2), np.asarray(hs_ref), atol=tol
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(cs), 1, 2), np.asarray(cs_ref), atol=tol
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(zs), 1, 2).astype(np.float32),
        np.asarray(zs_ref).astype(np.float32),
        atol=tol,
    )


def test_bwd_matches_autodiff():
    """dzs from the Pallas reverse recurrence must reproduce the grads the
    plain-autodiff scan produces end-to-end (via the full layer VJP)."""
    w_ih, w_hh, bias, x = _mk()
    cd = jnp.float32

    def loss_plain(w_ih, w_hh, bias, x):
        hs, cs, _ = rnn_lean._layer_fwd_impl(w_ih, w_hh, bias, x)
        return (hs * 1.7).sum() + (cs * 0.3).sum()

    ref_grads = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(w_ih, w_hh, bias, x)

    # Same cotangents through the Pallas bwd + the post-scan einsums.
    hs, cs, zs = rnn_lean._layer_fwd_impl(w_ih, w_hh, bias, x)
    dhs = jnp.full(hs.shape, 1.7, jnp.float32)
    dcs = jnp.full(cs.shape, 0.3, jnp.float32)
    tm = lambda a: jnp.swapaxes(a, 1, 2)
    dzs_t = rnn_pallas.lstm_scan_bwd(tm(zs), tm(cs), tm(dhs), tm(dcs), w_hh)
    dzs = jnp.swapaxes(dzs_t, 1, 2)  # (S, B, T, 4H)

    h_prev = jnp.concatenate([jnp.zeros_like(hs[:, :, :1]), hs[:, :, :-1]], axis=2)
    dw_ih = jnp.einsum("sbti,sbto->sio", x, dzs)
    dw_hh = jnp.einsum("sbth,sbto->sho", h_prev, dzs)
    db = dzs.sum(axis=(1, 2))
    dx = jnp.einsum("sbto,sio->sbti", dzs, w_ih)

    for got, want in zip((dw_ih, dw_hh, db, dx), ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_layer_core_grads_pallas_vs_scan():
    """Full custom-VJP layer: value+grad with the Pallas path forced on must
    match the XLA-scan path (both through rnn_lean's public wrapper)."""
    w_ih, w_hh, bias, x = _mk(s=1, b=3, t=5, d=8, h=8, seed=2)
    p = {
        "w_ih": w_ih[0],
        "w_hh": w_hh[0],
        "b_ih": bias[0] * 0.5,
        "b_hh": bias[0] * 0.5,
    }
    lengths = jnp.asarray([5, 3, 4], jnp.int32)

    def loss(p, x):
        hs, (h_last, c_last) = rnn_lean.lstm_layer_lean(p, x, lengths)
        return (hs * 1.3).sum() + h_last.sum() + (c_last * 0.7).sum()

    xx = x[0]
    ref_v, ref_g = jax.value_and_grad(loss)(p, xx)
    with rnn_pallas.force_pallas_rnn(True):
        got_v, got_g = jax.value_and_grad(loss)(p, xx)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-6)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(got_g[k]), np.asarray(ref_g[k]), atol=1e-5, err_msg=k
        )


def test_int8_decode_pallas_matches_qdot_scan():
    """The VMEM-resident int8 decode kernel must reproduce the XLA qdot
    scan's int8 decode (same weight/activation quantization arithmetic)."""
    from summarizer_tpu.nn.quant import rnn_int8_streaming

    rng = np.random.RandomState(4)
    L, B, H, T = 2, 3, 8, 5
    params = {
        "layers": [
            {
                "fwd": {
                    "w_ih": jnp.asarray(rng.randn(H, 4 * H) * 0.3, jnp.float32),
                    "w_hh": jnp.asarray(rng.randn(H, 4 * H) * 0.3, jnp.float32),
                    "b_ih": jnp.asarray(rng.randn(4 * H) * 0.1, jnp.float32),
                    "b_hh": jnp.asarray(rng.randn(4 * H) * 0.1, jnp.float32),
                }
            }
            for _ in range(L)
        ]
    }
    h0 = jnp.asarray(rng.randn(L, B, H) * 0.5, jnp.float32)
    c0 = jnp.asarray(rng.randn(L, B, H) * 0.5, jnp.float32)

    def tops_sum(p):
        return (rnn_lean.dlstm_decode_lean(p, T, h0, c0) * 1.3).sum()

    with rnn_int8_streaming():
        ref_tops = rnn_lean.dlstm_decode_lean(params, T, h0, c0)
        ref_g = jax.grad(tops_sum)(params)
        with rnn_pallas.force_pallas_rnn(True):
            got_tops = rnn_lean.dlstm_decode_lean(params, T, h0, c0)
            got_g = jax.grad(tops_sum)(params)

    np.testing.assert_allclose(
        np.asarray(got_tops), np.asarray(ref_tops), atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# --------------------------------------------------------- dp shard_map path
def _dp_mesh(n=8):
    from summarizer_tpu.parallel.mesh import make_mesh

    return make_mesh(n, dp=n, tp=1)


def test_layer_core_sharded_matches_scan():
    """shard_rnn_over(dp=8): the shard_map'ed Pallas layer (VJP included)
    must equal the plain XLA-scan path — the dp GAN path keeps the kernels
    (VERDICT r2 item 6)."""
    w_ih, w_hh, bias, x = _mk(s=2, b=8, t=5, d=8, h=8, seed=3)
    p = {
        "w_ih": w_ih[0],
        "w_hh": w_hh[0],
        "b_ih": bias[0] * 0.5,
        "b_hh": bias[0] * 0.5,
    }
    lengths = jnp.asarray([5, 3, 4, 5, 2, 5, 1, 4], jnp.int32)

    def loss(p, x):
        hs, (h_last, c_last) = rnn_lean.lstm_layer_lean(p, x, lengths)
        return (hs * 1.3).sum() + h_last.sum() + (c_last * 0.7).sum()

    xx = x[0]
    ref_v, ref_g = jax.value_and_grad(loss)(p, xx)
    with rnn_pallas.shard_rnn_over(_dp_mesh(), "dp"), \
            rnn_pallas.force_pallas_rnn(True):
        got_v, got_g = jax.value_and_grad(loss)(p, xx)
        # jit too: the real path runs inside a GSPMD-compiled step
        jit_v, jit_g = jax.jit(jax.value_and_grad(loss))(p, xx)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-6)
    np.testing.assert_allclose(float(jit_v), float(ref_v), rtol=1e-6)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(got_g[k]), np.asarray(ref_g[k]), atol=1e-5, err_msg=k
        )
        np.testing.assert_allclose(
            np.asarray(jit_g[k]), np.asarray(ref_g[k]), atol=1e-5, err_msg=k
        )


def test_layer_core_sharded_indivisible_falls_back():
    """A batch the dp axis does not divide must silently take the XLA scan
    (no shard_map error), with identical results."""
    w_ih, w_hh, bias, x = _mk(s=1, b=3, t=4, d=8, h=8, seed=5)
    p = {
        "w_ih": w_ih[0],
        "w_hh": w_hh[0],
        "b_ih": bias[0] * 0.5,
        "b_hh": bias[0] * 0.5,
    }
    lengths = jnp.asarray([4, 2, 3], jnp.int32)

    def loss(p, x):
        hs, _ = rnn_lean.lstm_layer_lean(p, x, lengths)
        return (hs * 1.1).sum()

    ref_v, ref_g = jax.value_and_grad(loss)(p, x[0])
    with rnn_pallas.shard_rnn_over(_dp_mesh(), "dp"), \
            rnn_pallas.force_pallas_rnn(True):
        got_v, got_g = jax.value_and_grad(loss)(p, x[0])
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-6)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(got_g[k]), np.asarray(ref_g[k]), atol=1e-5, err_msg=k
        )


def test_int8_decode_sharded_matches_qdot_scan():
    """The dp-sharded VMEM-resident int8 decoder == the XLA qdot scan."""
    from summarizer_tpu.nn.quant import rnn_int8_streaming

    rng = np.random.RandomState(6)
    L, B, H, T = 2, 8, 8, 4
    params = {
        "layers": [
            {
                "fwd": {
                    "w_ih": jnp.asarray(rng.randn(H, 4 * H) * 0.3, jnp.float32),
                    "w_hh": jnp.asarray(rng.randn(H, 4 * H) * 0.3, jnp.float32),
                    "b_ih": jnp.asarray(rng.randn(4 * H) * 0.1, jnp.float32),
                    "b_hh": jnp.asarray(rng.randn(4 * H) * 0.1, jnp.float32),
                }
            }
            for _ in range(L)
        ]
    }
    h0 = jnp.asarray(rng.randn(L, B, H) * 0.5, jnp.float32)
    c0 = jnp.asarray(rng.randn(L, B, H) * 0.5, jnp.float32)

    def tops_sum(p):
        return (rnn_lean.dlstm_decode_lean(p, T, h0, c0) * 1.3).sum()

    with rnn_int8_streaming():
        ref_tops = rnn_lean.dlstm_decode_lean(params, T, h0, c0)
        ref_g = jax.grad(tops_sum)(params)
        with rnn_pallas.shard_rnn_over(_dp_mesh(), "dp"), \
                rnn_pallas.force_pallas_rnn(True):
            got_tops = rnn_lean.dlstm_decode_lean(params, T, h0, c0)
            got_g = jax.grad(tops_sum)(params)

    np.testing.assert_allclose(np.asarray(got_tops), np.asarray(ref_tops), atol=1e-5)
    for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
