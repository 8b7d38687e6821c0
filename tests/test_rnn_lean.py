"""Parity: memory-lean custom-VJP LSTM vs plain-autodiff reference path.

Forward must be (near-)identical and gradients must match plain
``jax.grad`` through nn/rnn's original scan layers, including gradients
into the decoder's initial state (the SumGAN VAE bottleneck).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarizer_tpu.nn import rnn, rnn_lean

B, T, D, H = 3, 11, 8, 16


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def tree_allclose(a, b, atol):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=1e-4)


def lengths_of(rng):
    return jnp.asarray([T, T - 3, T - 6], jnp.int32)


def test_uni_layer_fwd_and_grad(rng):
    p = rnn.lstm_init(jax.random.PRNGKey(0), D, H)["layers"][0]["fwd"]
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = lengths_of(rng)
    w = jnp.asarray(rng.randn(B, T, H), jnp.float32)

    hs_ref, (hl_ref, cl_ref) = rnn._lstm_layer(p, x, lengths)
    hs_lean, (hl_lean, cl_lean) = rnn_lean.lstm_layer_lean(p, x, lengths)
    np.testing.assert_allclose(hs_ref, hs_lean, atol=1e-6)
    np.testing.assert_allclose(hl_ref, hl_lean, atol=1e-6)
    np.testing.assert_allclose(cl_ref, cl_lean, atol=1e-6)

    def loss(layer_fn, p, x):
        hs, (hl, cl) = layer_fn(p, x, lengths)
        return (hs * w).sum() + (hl * hl).sum() + jnp.tanh(cl).sum()

    g_ref = jax.grad(lambda p, x: loss(rnn._lstm_layer, p, x), argnums=(0, 1))(p, x)
    g_lean = jax.grad(
        lambda p, x: loss(rnn_lean.lstm_layer_lean, p, x), argnums=(0, 1)
    )(p, x)
    tree_allclose(g_ref, g_lean, atol=1e-4)


def test_bidir_layer_fwd_and_grad(rng):
    params = rnn.lstm_init(jax.random.PRNGKey(1), D, H, bidirectional=True)
    entry = params["layers"][0]
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = lengths_of(rng)
    w = jnp.asarray(rng.randn(B, T, 2 * H), jnp.float32)

    out_ref = rnn._lstm_layer_bidir(entry["fwd"], entry["bwd"], x, lengths)
    out_lean = rnn_lean.lstm_layer_lean_bidir(
        entry["fwd"], entry["bwd"], x, lengths, rnn.masked_reverse
    )
    np.testing.assert_allclose(out_ref[0], out_lean[0], atol=1e-6)
    for i in (1, 2):
        np.testing.assert_allclose(out_ref[i][0], out_lean[i][0], atol=1e-6)
        np.testing.assert_allclose(out_ref[i][1], out_lean[i][1], atol=1e-6)

    def loss_ref(entry, x):
        out, (hf, cf), (hb, cb) = rnn._lstm_layer_bidir(
            entry["fwd"], entry["bwd"], x, lengths
        )
        return (out * w).sum() + (hf * hb).sum() + (cf + cb).sum()

    def loss_lean(entry, x):
        out, (hf, cf), (hb, cb) = rnn_lean.lstm_layer_lean_bidir(
            entry["fwd"], entry["bwd"], x, lengths, rnn.masked_reverse
        )
        return (out * w).sum() + (hf * hb).sum() + (cf + cb).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(entry, x)
    g_lean = jax.grad(loss_lean, argnums=(0, 1))(entry, x)
    tree_allclose(g_ref, g_lean, atol=1e-4)


def test_stack_apply_lean_matches_reference_path(rng, monkeypatch):
    """lstm_apply (2-layer bidir) through both switch positions."""
    params = rnn.lstm_init(jax.random.PRNGKey(2), D, H, num_layers=2, bidirectional=True)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = lengths_of(rng)

    def run():
        out, (hl, cl) = rnn.lstm_apply(params, x, lengths)
        return out, hl, cl

    monkeypatch.setattr(rnn, "USE_LEAN_LSTM", False)
    ref = run()
    monkeypatch.setattr(rnn, "USE_LEAN_LSTM", True)
    lean = run()
    for a, b in zip(ref, lean):
        np.testing.assert_allclose(a, b, atol=1e-6)


def _dlstm_reference(params, t_max, h0, c0):
    """The original scan-of-cell_step decoder (pre-lean dlstm_apply)."""

    def step(carry, _):
        x, h, c = carry
        x2, (h2, c2) = rnn.lstm_cell_step(params, x, h, c)
        return (x2, h2, c2), x2

    x0 = jnp.zeros((h0.shape[1], h0.shape[2]), jnp.float32)
    _, tops = jax.lax.scan(step, (x0, h0, c0), None, length=t_max)
    return jnp.swapaxes(tops, 0, 1)


def test_dlstm_decode_fwd_and_grad(rng):
    layers = 2
    params = rnn.lstm_init(jax.random.PRNGKey(3), H, H, num_layers=layers)
    h0 = jnp.asarray(rng.randn(layers, B, H), jnp.float32)
    c0 = jnp.asarray(rng.randn(layers, B, H), jnp.float32)
    w = jnp.asarray(rng.randn(B, T, H), jnp.float32)

    ref = _dlstm_reference(params, T, h0, c0)
    lean = rnn_lean.dlstm_decode_lean(params, T, h0, c0)
    np.testing.assert_allclose(ref, lean, atol=1e-6)

    def loss(fn, params, h0, c0):
        return (fn(params, T, h0, c0) * w).sum()

    g_ref = jax.grad(
        lambda p, h, c: loss(_dlstm_reference, p, h, c), argnums=(0, 1, 2)
    )(params, h0, c0)
    g_lean = jax.grad(
        lambda p, h, c: loss(rnn_lean.dlstm_decode_lean, p, h, c), argnums=(0, 1, 2)
    )(params, h0, c0)
    tree_allclose(g_ref, g_lean, atol=1e-4)


def test_dlstm_single_layer(rng):
    params = rnn.lstm_init(jax.random.PRNGKey(4), H, H, num_layers=1)
    h0 = jnp.asarray(rng.randn(1, B, H), jnp.float32)
    c0 = jnp.asarray(rng.randn(1, B, H), jnp.float32)
    ref = _dlstm_reference(params, T, h0, c0)
    lean = rnn_lean.dlstm_decode_lean(params, T, h0, c0)
    np.testing.assert_allclose(ref, lean, atol=1e-6)
