"""Reference-checkpoint import/export (utils/torch_import.py).

Three layers of certification:

1. Golden key names: the exported state_dict must use the exact torch key
   names the reference modules register (including duplicate registrations:
   shared LayerNorm instances and nn.TransformerEncoder's deep-copied
   prototype layer) — the key set IS the migration interface.
2. Roundtrip: params -> state_dict -> params is the identity.
3. Functional (torch): a real torch module shaped exactly like the
   reference architecture (same attribute names) is exported with
   ``.state_dict()`` and imported; our apply must reproduce its forward.
   This catches transpose/gate-order/packing errors the roundtrip can't.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from summarizer_tpu.models import get_model
from summarizer_tpu.utils.torch_import import (
    IMPORTABLE,
    export_state_dict,
    import_state_dict,
    infer_hp,
)

SMALL_HP = {
    "logistic": {"input_size": 8},
    "vasnet": {"input_size": 8, "max_pos": 12, "pos_embed": "simple"},
    "transformer": {"input_size": 8, "encoder_layers": 2, "attention_heads": 2},
    "dsn": {"input_size": 8, "hidden_size": 6, "num_layers": 2},
    "sumgan": {
        "input_size": 8,
        "sLSTM_hidden_size": 6,
        "sLSTM_num_layers": 2,
        "edLSTM_hidden_size": 10,
        "edLSTM_num_layers": 2,
        "cLSTM_hidden_size": 6,
        "cLSTM_num_layers": 2,
    },
    "sumgan_att": {
        "input_size": 8,
        "s_encoder_layers": 2,
        "ae_encoder_layers": 2,
        "s_attention_heads": 2,
        "ae_attention_heads": 2,
        "cLSTM_hidden_size": 6,
        "cLSTM_num_layers": 2,
    },
}

GOLDEN_KEYS = {
    # Reference attribute registrations (cited in utils/torch_import.py).
    "logistic": ["perceptron.weight", "perceptron.bias"],
    "vasnet": [
        "K.weight",
        "attention_head_projection.weight",
        "k1.bias",
        "layer_norm.weight",
        "pos_embed.weight",
    ],
    "transformer": [
        "transformer_encoder.layers.0.self_attn.in_proj_weight",
        "transformer_encoder.layers.1.self_attn.out_proj.bias",
        "transformer_encoder.layers.0.linear1.weight",
        "transformer_encoder.layers.0.norm2.bias",
        "transformer_encoder.norm.weight",  # shared final norm ...
        "layer_norm.weight",  # ... registered twice (transformer.py:47-50)
        "transformer_encoder_layer.linear1.weight",  # deep-copied prototype
        "k1.weight",
        "k2.bias",
    ],
    "dsn": [
        "rnn.weight_ih_l0",
        "rnn.weight_hh_l1_reverse",
        "rnn.bias_hh_l0_reverse",
        "out.0.weight",
        "out.0.bias",
    ],
    "sumgan": [
        "summarizer.s_lstm.lstm.weight_ih_l0_reverse",
        "summarizer.s_lstm.out.weight",
        "summarizer.vae.e_lstm.lstm.weight_ih_l1",
        "summarizer.vae.e_lstm.mu.weight",
        "summarizer.vae.e_lstm.logvar.bias",
        "summarizer.vae.d_lstm.lstm.weight_hh_l0",
        "summarizer.vae.d_lstm.recons.weight",
        "gan.c_lstm.lstm.weight_ih_l0",
        "gan.c_lstm.out.0.weight",
    ],
    "sumgan_att": [
        "summarizer.selector.transformer_encoder.layers.1.self_attn.in_proj_bias",
        "summarizer.selector.transformer_encoder.norm.weight",
        "summarizer.selector.layer_norm.weight",
        "summarizer.selector.transformer_encoder_layer.norm1.weight",
        "summarizer.selector.out.0.weight",
        "summarizer.ae.transformer_encoder.layers.0.linear2.bias",
        "summarizer.ae.transformer_decoder.layers.1.multihead_attn.in_proj_weight",
        "summarizer.ae.transformer_decoder.layers.0.norm3.bias",
        "summarizer.ae.transformer_decoder_layer.self_attn.in_proj_weight",
        "gan.c_lstm.lstm.weight_hh_l1",
        "gan.c_lstm.out.0.bias",
    ],
}


def _tree_eq(a, b, path=""):
    if isinstance(a, dict):
        assert isinstance(b, dict) and set(a) == set(b), path
        for k in a:
            _tree_eq(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_eq(x, y, f"{path}/{i}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


@pytest.mark.parametrize("model", IMPORTABLE)
def test_roundtrip_and_golden_keys(model):
    params = get_model(model).module.init(jax.random.PRNGKey(3), SMALL_HP[model])
    sd = export_state_dict(model, params)
    for key in GOLDEN_KEYS[model]:
        assert key in sd, f"{model}: exported state_dict missing {key}"
    back = import_state_dict(model, sd)
    _tree_eq(params, back)


@pytest.mark.parametrize("model", IMPORTABLE)
def test_infer_hp_reconstructs_architecture(model):
    params = get_model(model).module.init(jax.random.PRNGKey(4), SMALL_HP[model])
    sd = export_state_dict(model, params)
    hp = infer_hp(model, sd)
    # Re-init from the inferred hp: identical tree structure and shapes.
    tpl = get_model(model).module.init(jax.random.PRNGKey(5), hp)
    ours = jax.tree_util.tree_structure(params)
    theirs = jax.tree_util.tree_structure(tpl)
    assert ours == theirs
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(tpl)):
        assert np.shape(a) == np.shape(b)


def test_unknown_keys_raise():
    params = get_model("logistic").module.init(jax.random.PRNGKey(0), SMALL_HP["logistic"])
    sd = export_state_dict("logistic", params)
    sd["stray.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(KeyError, match="stray"):
        import_state_dict("logistic", sd)


def test_wrong_model_is_loud():
    params = get_model("logistic").module.init(jax.random.PRNGKey(0), SMALL_HP["logistic"])
    sd = export_state_dict("logistic", params)
    with pytest.raises(KeyError):
        import_state_dict("vasnet", sd)


def test_gru_cell_inferred():
    hp = {"input_size": 8, "hidden_size": 6, "num_layers": 1, "cell": "gru"}
    params = get_model("dsn").module.init(jax.random.PRNGKey(0), hp)
    sd = export_state_dict("dsn", params)
    assert infer_hp("dsn", sd)["cell"] == "gru"
    back = import_state_dict("dsn", sd)
    _tree_eq(params, back)


# --------------------------------------------------------------- functional
torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def test_torch_dsn_state_dict_forward_parity():
    """A torch module with the reference DSN's exact attribute names
    (dsn.py:19-36) -> state_dict() -> import -> our apply matches."""
    torch.manual_seed(0)
    d, h, t = 8, 6, 11

    class RefDSN(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.LSTM(d, h, num_layers=1, bidirectional=True)
            self.out = nn.Sequential(nn.Linear(2 * h, 1), nn.Sigmoid())

        def forward(self, x):  # (T, B, D)
            hh, _ = self.rnn(x)
            return self.out(hh)

    m = RefDSN().eval()
    params = import_state_dict("dsn", dict(m.state_dict()))
    x = np.random.RandomState(0).randn(t, 1, d).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()[:, 0, 0]
    mask = jnp.ones((1, t), jnp.float32)
    ours = get_model("dsn").module.apply(
        params, jnp.asarray(x.transpose(1, 0, 2)), mask,
        hp={"input_size": d, "hidden_size": h, "num_layers": 1},
    )
    np.testing.assert_allclose(np.asarray(ours)[0], ref, atol=1e-5, rtol=1e-5)


def test_torch_transformer_state_dict_forward_parity():
    """A torch module with the reference Transformer's exact attribute
    names (transformer.py:46-55) — including the shared final/head norm and
    the deep-copied prototype layer in the state_dict — imports and
    reproduces the reference forward (transformer.py:58-103, eval mode)."""
    torch.manual_seed(1)
    d, heads, layers, t = 16, 4, 2, 9

    class RefTransformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.layer_norm = nn.LayerNorm(d, 1e-5)
            self.transformer_encoder_layer = nn.TransformerEncoderLayer(
                d_model=d, nhead=heads, dim_feedforward=d, dropout=0.1,
                activation="relu",
            )
            self.transformer_encoder = nn.TransformerEncoder(
                encoder_layer=self.transformer_encoder_layer,
                num_layers=layers,
                norm=self.layer_norm,
            )
            self.k1 = nn.Linear(d, d)
            self.k2 = nn.Linear(d, 1)

        def forward(self, x):  # (T, B, D), eval mode (dropout off)
            y = self.transformer_encoder(x)
            y = torch.relu(self.k1(y))
            y = self.layer_norm(y)
            return torch.sigmoid(self.k2(y))

    m = RefTransformer().eval()
    sd = dict(m.state_dict())
    assert any(k.startswith("transformer_encoder_layer.") for k in sd)
    assert "layer_norm.weight" in sd and "transformer_encoder.norm.weight" in sd
    params = import_state_dict(
        "transformer", sd, {"attention_heads": heads}
    )
    x = np.random.RandomState(1).randn(t, 1, d).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()[:, 0, 0]
    mask = jnp.ones((1, t), jnp.float32)
    ours = get_model("transformer").module.apply(
        params, jnp.asarray(x.transpose(1, 0, 2)), mask, train=False,
        hp={"input_size": d, "encoder_layers": layers,
            "attention_heads": heads, "flash": 0},
    )
    np.testing.assert_allclose(np.asarray(ours)[0], ref, atol=2e-5, rtol=1e-4)

    # Reverse direction: the exported state_dict (incl. prototype-layer and
    # duplicate-norm keys) must satisfy torch's STRICT load on the same
    # reference-shaped module, and survive the torch->jax->torch roundtrip.
    out_sd = export_state_dict("transformer", params)
    m2 = RefTransformer()
    m2.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in out_sd.items()})
    for k, v in m2.state_dict().items():
        if k.startswith(("transformer_encoder_layer.",)):
            continue  # prototype layer: unused by forward, aliased to layer 0
        np.testing.assert_allclose(v.numpy(), sd[k].numpy(), atol=0, err_msg=k)


def test_torch_sumgan_selector_state_dict_forward_parity():
    """SumGAN inference = the sLSTM selector (sumgan.py:251-258).  A torch
    module with the reference's exact nested attribute names — 2-layer
    bidirectional selector LSTM (layer-1 input is the 2H concat, the case
    the 1-layer DSN test can't cover) — exports with .state_dict() and
    imports; our selector forward must match."""
    torch.manual_seed(2)
    d, h, t = 8, 6, 13

    class RefSLSTM(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(d, h, num_layers=2, bidirectional=True)
            self.out = nn.Linear(2 * h, 1)
            self.sig = nn.Sigmoid()

        def forward(self, x):
            hh, _ = self.lstm(x)
            return self.sig(self.out(hh))

    class RefELSTM(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(d, 10, num_layers=2)
            self.mu = nn.Linear(10, 10)
            self.logvar = nn.Linear(10, 10)

    class RefDLSTM(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(10, 10, num_layers=2)
            self.recons = nn.Linear(10, d)

    class RefVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.e_lstm = RefELSTM()
            self.d_lstm = RefDLSTM()

    class RefSummarizer(nn.Module):
        def __init__(self):
            super().__init__()
            self.s_lstm = RefSLSTM()
            self.vae = RefVAE()

    class RefCLSTM(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(d, h, num_layers=2)
            self.out = nn.Sequential(nn.Linear(h, 1), nn.Sigmoid())

    class RefGAN(nn.Module):
        def __init__(self):
            super().__init__()
            self.c_lstm = RefCLSTM()

    class RefSumGAN(nn.Module):
        def __init__(self):
            super().__init__()
            self.summarizer = RefSummarizer()
            self.gan = RefGAN()

        def forward(self, x):  # selector only (sumgan.py:251-258)
            return self.summarizer.s_lstm(x)

    m = RefSumGAN().eval()
    params = import_state_dict("sumgan", dict(m.state_dict()))
    x = np.random.RandomState(2).randn(t, 1, d).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()[:, 0, 0]
    from summarizer_tpu.models.sumgan import slstm_apply

    ours = slstm_apply(
        params["s_lstm"], jnp.asarray(x.transpose(1, 0, 2)),
        jnp.full((1,), t, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(ours)[0], ref, atol=1e-5, rtol=1e-5)
