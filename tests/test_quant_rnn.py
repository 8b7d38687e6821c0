"""Int8 weight-streaming mode (nn/quant.py): bounded error vs full precision.

The int8 path is an opt-in perf mode for the HBM-bound GAN recurrences; it
is NOT bit-exact, so these tests bound the deviation (cosine similarity and
relative error) of forwards and straight-through gradients, and check the
policy gating (off by default, on inside the context).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarizer_tpu.nn import quant, rnn, rnn_lean

B, T, D, H = 3, 11, 8, 16


def cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def test_qdot_matches_dense():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64), jnp.float32)
    w = jnp.asarray(rng.randn(64, 32) * 0.1, jnp.float32)
    wq, ws = quant.quant_weight_fwd(w)
    out = quant.qdot(x, wq, ws, "bh,ho->bo")
    ref = x @ w
    assert cos(out, ref) > 0.9995
    np.testing.assert_allclose(out, ref, rtol=0.15, atol=0.05)


def test_qdot_bwd_copy_matches_transposed_dense():
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(4, 32), jnp.float32)
    w = jnp.asarray(rng.randn(64, 32) * 0.1, jnp.float32)
    wq, ws_t = quant.quant_weight_bwd(w)
    out = quant.qdot(g, wq, ws_t, "bo,ho->bh")
    ref = g @ w.T
    assert cos(out, ref) > 0.9995


def test_policy_gating_off_by_default():
    assert not quant.int8_enabled()
    with quant.rnn_int8_streaming():
        assert quant.int8_enabled()
    assert not quant.int8_enabled()


def test_lean_layer_int8_close_to_exact():
    rng = np.random.RandomState(2)
    p = rnn.lstm_init(jax.random.PRNGKey(0), D, H)["layers"][0]["fwd"]
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([T, T - 3, T - 6], jnp.int32)

    hs_ref, (hl_ref, _) = rnn_lean.lstm_layer_lean(p, x, lengths)
    with quant.rnn_int8_streaming():
        hs_q, (hl_q, _) = rnn_lean.lstm_layer_lean(p, x, lengths)
    assert cos(hs_q, hs_ref) > 0.999
    assert cos(hl_q, hl_ref) > 0.995


def test_lean_layer_int8_grads_aligned():
    rng = np.random.RandomState(3)
    p = rnn.lstm_init(jax.random.PRNGKey(1), D, H)["layers"][0]["fwd"]
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([T, T, T], jnp.int32)
    w = jnp.asarray(rng.randn(B, T, H), jnp.float32)

    def loss(p, x):
        hs, _ = rnn_lean.lstm_layer_lean(p, x, lengths)
        return (hs * w).sum()

    g_ref = jax.grad(loss, argnums=(0, 1))(p, x)
    with quant.rnn_int8_streaming():
        g_q = jax.grad(loss, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_q)):
        assert cos(a, b) > 0.99, (np.shape(a), cos(a, b))
        assert np.all(np.isfinite(np.asarray(b)))


def test_dlstm_decode_int8_close_and_grads_flow():
    layers = 2
    params = rnn.lstm_init(jax.random.PRNGKey(2), H, H, num_layers=layers)
    rng = np.random.RandomState(4)
    h0 = jnp.asarray(rng.randn(layers, B, H) * 0.5, jnp.float32)
    c0 = jnp.asarray(rng.randn(layers, B, H) * 0.5, jnp.float32)

    tops_ref = rnn_lean.dlstm_decode_lean(params, T, h0, c0)
    with quant.rnn_int8_streaming():
        tops_q = rnn_lean.dlstm_decode_lean(params, T, h0, c0)
    assert cos(tops_q, tops_ref) > 0.99

    def loss(params, h0, c0):
        return (rnn_lean.dlstm_decode_lean(params, T, h0, c0) ** 2).sum()

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(params, h0, c0)
    with quant.rnn_int8_streaming():
        g_q = jax.grad(loss, argnums=(0, 1, 2))(params, h0, c0)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_q)):
        assert np.all(np.isfinite(np.asarray(b)))
        if np.linalg.norm(np.asarray(a)) > 1e-6:
            assert cos(a, b) > 0.98, (np.shape(a), cos(a, b))


def test_sumgan_int8_pretrain_learns(synth_records):
    """The opt-in mode must still LEARN: VAE pretrain loss decreases."""
    from summarizer_tpu.data.batching import pack_train
    from summarizer_tpu.models import sumgan as sg
    from summarizer_tpu.nn.policy import rnn_compute
    from summarizer_tpu.train.adversarial import kl_prior, l2_norm_rows
    import optax

    pack = pack_train(synth_records)
    feats = jnp.asarray(pack.features)
    mask = jnp.asarray(pack.mask)
    hp = dict(input_size=64, edLSTM_hidden_size=32, sLSTM_hidden_size=16,
              cLSTM_hidden_size=16)

    with rnn_compute(jnp.bfloat16), quant.rnn_int8_streaming():
        params = sg.init(jax.random.PRNGKey(0), hp)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        def loss_fn(p, key):
            lengths = mask.sum(-1).astype(jnp.int32)
            x_hat, (mu, logvar) = sg.vae_forward(p, feats, lengths, key)
            return l2_norm_rows(feats, x_hat, mask) + kl_prior(mu, logvar)

        @jax.jit
        def step(p, s, key):
            l, g = jax.value_and_grad(loss_fn)(p, key)
            upd, s = opt.update(g, s, p)
            return optax.apply_updates(p, upd), s, l

        losses = []
        for i in range(30):
            params, opt_state, l = step(params, opt_state, jax.random.PRNGKey(i))
            losses.append(float(l))
    # 30 Adam steps on the tiny VAE cut the loss by ~6%; assert a clear,
    # monotone-ish improvement rather than an arbitrary deep drop.
    assert losses[-1] < losses[0] * 0.96, losses[:3] + losses[-3:]
    assert losses[-1] < min(losses[:3]), losses[:3] + losses[-3:]
