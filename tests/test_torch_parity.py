"""Golden parity vs torch layers (the reference's building blocks).

Weights are copied torch -> pytree and outputs compared in eval mode
(dropout off).  This pins our scan-LSTM/GRU cells, masked bidirectionality,
and post-norm transformer blocks to the exact semantics the reference
models rely on (nn.LSTM/nn.GRU/nn.TransformerEncoderLayer/DecoderLayer).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from summarizer_tpu.nn import (  # noqa: E402
    decoder_layer_apply,
    encoder_layer_apply,
    gru_apply,
    lstm_apply,
)
from summarizer_tpu.nn.attention import mha_apply  # noqa: E402


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def copy_rnn_params(torch_rnn, n_gates, num_layers, bidirectional):
    layers = []
    for layer_idx in range(num_layers):
        entry = {}
        for direction, tag in (("fwd", ""), ("bwd", "_reverse")):
            if direction == "bwd" and not bidirectional:
                continue
            entry[direction] = {
                "w_ih": t2j(getattr(torch_rnn, f"weight_ih_l{layer_idx}{tag}").T),
                "w_hh": t2j(getattr(torch_rnn, f"weight_hh_l{layer_idx}{tag}").T),
                "b_ih": t2j(getattr(torch_rnn, f"bias_ih_l{layer_idx}{tag}")),
                "b_hh": t2j(getattr(torch_rnn, f"bias_hh_l{layer_idx}{tag}")),
            }
        layers.append(entry)
    return {"layers": layers}


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(bidirectional):
    torch.manual_seed(0)
    d_in, hidden, layers = 12, 7, 2
    rnn = torch.nn.LSTM(d_in, hidden, num_layers=layers, bidirectional=bidirectional)
    params = copy_rnn_params(rnn, 4, layers, bidirectional)

    # Ragged lengths: torch sees each true-length sequence individually.
    lengths = [9, 5]
    t_max = 9
    rng = np.random.RandomState(1)
    xs = [rng.randn(L, d_in).astype(np.float32) for L in lengths]

    x_pad = np.zeros((2, t_max, d_in), np.float32)
    for i, x in enumerate(xs):
        x_pad[i, : len(x)] = x
    ours, (h_last, c_last) = lstm_apply(params, jnp.asarray(x_pad), jnp.asarray(lengths))

    for i, x in enumerate(xs):
        with torch.no_grad():
            out_t, (h_t, c_t) = rnn(torch.from_numpy(x).unsqueeze(1))
        np.testing.assert_allclose(
            np.asarray(ours[i, : lengths[i]]), out_t[:, 0].numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(h_last[:, i]), h_t[:, 0].numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(c_last[:, i]), c_t[:, 0].numpy(), atol=2e-5
        )


@pytest.mark.parametrize("bidirectional", [False, True])
def test_gru_matches_torch(bidirectional):
    torch.manual_seed(0)
    d_in, hidden, layers = 10, 6, 2
    rnn = torch.nn.GRU(d_in, hidden, num_layers=layers, bidirectional=bidirectional)
    params = copy_rnn_params(rnn, 3, layers, bidirectional)

    lengths = [8, 4]
    rng = np.random.RandomState(2)
    xs = [rng.randn(L, d_in).astype(np.float32) for L in lengths]
    x_pad = np.zeros((2, 8, d_in), np.float32)
    for i, x in enumerate(xs):
        x_pad[i, : len(x)] = x
    ours, _ = gru_apply(params, jnp.asarray(x_pad), jnp.asarray(lengths))

    for i, x in enumerate(xs):
        with torch.no_grad():
            out_t, _ = rnn(torch.from_numpy(x).unsqueeze(1))
        np.testing.assert_allclose(
            np.asarray(ours[i, : lengths[i]]), out_t[:, 0].numpy(), atol=2e-5
        )


def copy_mha(mha):
    return {
        "w_in": t2j(mha.in_proj_weight.T),
        "b_in": t2j(mha.in_proj_bias),
        "out": {"w": t2j(mha.out_proj.weight.T), "b": t2j(mha.out_proj.bias)},
    }


def test_mha_matches_torch():
    torch.manual_seed(0)
    d, heads, t, b = 16, 4, 6, 2
    mha = torch.nn.MultiheadAttention(d, heads)
    params = copy_mha(mha)
    rng = np.random.RandomState(3)
    x = rng.randn(t, b, d).astype(np.float32)
    with torch.no_grad():
        want, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    xb = jnp.asarray(np.swapaxes(x, 0, 1))  # (B, T, D)
    got = mha_apply(params, xb, xb, xb, heads)
    np.testing.assert_allclose(
        np.asarray(got), np.swapaxes(want.numpy(), 0, 1), atol=2e-5
    )


def copy_encoder_layer(layer):
    return {
        "attn": copy_mha(layer.self_attn),
        "lin1": {"w": t2j(layer.linear1.weight.T), "b": t2j(layer.linear1.bias)},
        "lin2": {"w": t2j(layer.linear2.weight.T), "b": t2j(layer.linear2.bias)},
        "norm1": {"g": t2j(layer.norm1.weight), "b": t2j(layer.norm1.bias)},
        "norm2": {"g": t2j(layer.norm2.weight), "b": t2j(layer.norm2.bias)},
    }


def test_encoder_layer_matches_torch():
    torch.manual_seed(0)
    d, heads = 16, 4
    layer = torch.nn.TransformerEncoderLayer(d, heads, dim_feedforward=d, dropout=0.0)
    layer.eval()
    params = copy_encoder_layer(layer)
    rng = np.random.RandomState(4)
    x = rng.randn(5, 2, d).astype(np.float32)
    with torch.no_grad():
        want = layer(torch.from_numpy(x))
    got = encoder_layer_apply(
        params, jnp.asarray(np.swapaxes(x, 0, 1)), heads, train=False, rate=0.0
    )
    np.testing.assert_allclose(
        np.asarray(got), np.swapaxes(want.numpy(), 0, 1), atol=3e-5
    )


def test_decoder_layer_matches_torch():
    torch.manual_seed(0)
    d, heads = 16, 4
    layer = torch.nn.TransformerDecoderLayer(d, heads, dim_feedforward=d, dropout=0.0)
    layer.eval()
    params = {
        "self_attn": copy_mha(layer.self_attn),
        "cross_attn": copy_mha(layer.multihead_attn),
        "lin1": {"w": t2j(layer.linear1.weight.T), "b": t2j(layer.linear1.bias)},
        "lin2": {"w": t2j(layer.linear2.weight.T), "b": t2j(layer.linear2.bias)},
        "norm1": {"g": t2j(layer.norm1.weight), "b": t2j(layer.norm1.bias)},
        "norm2": {"g": t2j(layer.norm2.weight), "b": t2j(layer.norm2.bias)},
        "norm3": {"g": t2j(layer.norm3.weight), "b": t2j(layer.norm3.bias)},
    }
    rng = np.random.RandomState(5)
    tgt = rng.randn(5, 2, d).astype(np.float32)
    mem = rng.randn(7, 2, d).astype(np.float32)
    with torch.no_grad():
        want = layer(torch.from_numpy(tgt), torch.from_numpy(mem))
    got = decoder_layer_apply(
        params,
        jnp.asarray(np.swapaxes(tgt, 0, 1)),
        jnp.asarray(np.swapaxes(mem, 0, 1)),
        heads,
        train=False,
        rate=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.swapaxes(want.numpy(), 0, 1), atol=3e-5
    )
