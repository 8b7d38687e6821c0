"""Import/export trained reference checkpoints (torch ``.pth`` state_dicts).

The reference persists a trained model as ``torch.save(state_dict)``
(summarizer/models/__init__.py:179-183, one ``.pth`` per splits file).  A
user migrating from the reference carries those files; this module maps
them key-for-key onto this framework's param pytrees — and back — so a
reference-trained model can be evaluated, benchmarked, or served here
without retraining (and a TPU-trained one can be loaded by the reference).

Key-name contract per family (torch key -> pytree path), derived from the
reference module attribute names:

- logistic:  ``perceptron.{weight,bias}``            (logistic.py:19)
- vasnet:    ``K/Q/V/attention_head_projection``, ``k1/k2``, ``layer_norm``,
             optional ``pos_embed`` Embedding         (vasnet.py:36-66)
- transformer: ``transformer_encoder.layers.{i}.*`` + the SHARED final/head
             norm registered at BOTH ``layer_norm.*`` and
             ``transformer_encoder.norm.*``           (transformer.py:47-53)
- dsn:       ``rnn.{weight,bias}_{ih,hh}_l{k}[_reverse]``, ``out.0.*``
             (dsn.py:23-36; LSTM i,f,g,o / GRU r,z,n gate order preserved)
- sumgan:    ``summarizer.s_lstm|vae.e_lstm|vae.d_lstm`` + ``gan.c_lstm``
             (sumgan.py:23-258)
- sumgan_att: ``summarizer.selector|ae`` transformers + ``gan.c_lstm``
             (sumgan_att.py:20-133)

torch ``nn.Linear`` stores ``weight`` as (out, in); this framework stores
``w`` as (in, out) for a single MXU-friendly ``x @ w`` — every 2-D weight
transposes on the way through.  ``nn.TransformerEncoder(encoder_layer=...)``
deep-copies the prototype layer, so reference state_dicts also contain the
UNUSED prototype's params (``transformer_encoder_layer.*``); import ignores
them, export re-emits them (aliased to layer 0) so the reference's strict
``load_state_dict`` accepts the file.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "import_state_dict",
    "export_state_dict",
    "infer_hp",
    "IMPORTABLE",
]

IMPORTABLE = ("logistic", "vasnet", "transformer", "dsn", "sumgan", "sumgan_att")

# A rule is (torch_key, pytree_path, kind, mode):
#   kind: "t" = 2-D transpose, "i" = identity copy
#   mode: "real" = authoritative value; "alias" = duplicate registration in
#         the torch module tree (shared instance or deep-copied prototype):
#         skipped on import, emitted from its mapped path on export.
_T, _I = "t", "i"


# ------------------------------------------------------------- rule builders
def _lin(key, path, bias=True):
    rules = [(f"{key}.weight", path + ("w",), _T, "real")]
    if bias:
        rules.append((f"{key}.bias", path + ("b",), _I, "real"))
    return rules


def _ln(key, path, mode="real"):
    return [
        (f"{key}.weight", path + ("g",), _I, mode),
        (f"{key}.bias", path + ("b",), _I, mode),
    ]


def _rnn(key, path, n_layers, bidirectional, mode="real"):
    rules = []
    dirs = (("", "fwd"), ("_reverse", "bwd")) if bidirectional else (("", "fwd"),)
    for i in range(n_layers):
        for suffix, dirkey in dirs:
            base = path + ("layers", i, dirkey)
            rules += [
                (f"{key}.weight_ih_l{i}{suffix}", base + ("w_ih",), _T, mode),
                (f"{key}.weight_hh_l{i}{suffix}", base + ("w_hh",), _T, mode),
                (f"{key}.bias_ih_l{i}{suffix}", base + ("b_ih",), _I, mode),
                (f"{key}.bias_hh_l{i}{suffix}", base + ("b_hh",), _I, mode),
            ]
    return rules


def _mha(key, path, mode="real"):
    return [
        (f"{key}.in_proj_weight", path + ("w_in",), _T, mode),
        (f"{key}.in_proj_bias", path + ("b_in",), _I, mode),
        (f"{key}.out_proj.weight", path + ("out", "w"), _T, mode),
        (f"{key}.out_proj.bias", path + ("out", "b"), _I, mode),
    ]


def _enc_layer(key, path, mode="real"):
    return (
        _mha(f"{key}.self_attn", path + ("attn",), mode)
        + _lin_m(f"{key}.linear1", path + ("lin1",), mode)
        + _lin_m(f"{key}.linear2", path + ("lin2",), mode)
        + _ln(f"{key}.norm1", path + ("norm1",), mode)
        + _ln(f"{key}.norm2", path + ("norm2",), mode)
    )


def _dec_layer(key, path, mode="real"):
    return (
        _mha(f"{key}.self_attn", path + ("self_attn",), mode)
        + _mha(f"{key}.multihead_attn", path + ("cross_attn",), mode)
        + _lin_m(f"{key}.linear1", path + ("lin1",), mode)
        + _lin_m(f"{key}.linear2", path + ("lin2",), mode)
        + _ln(f"{key}.norm1", path + ("norm1",), mode)
        + _ln(f"{key}.norm2", path + ("norm2",), mode)
        + _ln(f"{key}.norm3", path + ("norm3",), mode)
    )


def _lin_m(key, path, mode):
    return [
        (f"{key}.weight", path + ("w",), _T, mode),
        (f"{key}.bias", path + ("b",), _I, mode),
    ]


# ------------------------------------------------------ per-family rule sets
def _rules_logistic(tpl):
    return _lin("perceptron", ("head",))


def _rules_vasnet(tpl):
    rules = (
        _lin("K", ("K",), bias=False)
        + _lin("Q", ("Q",), bias=False)
        + _lin("V", ("V",), bias=False)
        + _lin("attention_head_projection", ("out",), bias=False)
        + _lin("k1", ("k1",))
        + _lin("k2", ("k2",))
        + _ln("layer_norm", ("norm",))
    )
    if "pos" in tpl and "emb" in tpl["pos"]:  # learned ("simple") only; the
        # sin/cos table is an unregistered plain attribute in the reference
        # (vasnet.py:43-47) and is reconstructed from hp, not the file.
        rules.append(("pos_embed.weight", ("pos", "emb", "table"), _I, "real"))
    return rules


def _rules_transformer(tpl):
    rules = []
    for i in range(len(tpl["layers"])):
        rules += _enc_layer(f"transformer_encoder.layers.{i}", ("layers", i))
    # The deep-copied prototype layer (unused by forward, still registered).
    rules += _enc_layer("transformer_encoder_layer", ("layers", 0), mode="alias")
    # One LayerNorm instance registered twice (transformer.py:47-50).
    rules += _ln("transformer_encoder.norm", ("norm",))
    rules += _ln("layer_norm", ("norm",), mode="alias")
    rules += _lin("k1", ("k1",)) + _lin("k2", ("k2",))
    if "pos" in tpl and "emb" in tpl["pos"]:
        rules.append(("pos_embed.weight", ("pos", "emb", "table"), _I, "real"))
    return rules


def _rules_dsn(tpl):
    layers = tpl["rnn"]["layers"]
    return _rnn("rnn", ("rnn",), len(layers), "bwd" in layers[0]) + _lin(
        "out.0", ("out",)
    )


def _rules_sumgan(tpl):
    def n(sub):
        return len(tpl[sub]["lstm"]["layers"])

    return (
        _rnn("summarizer.s_lstm.lstm", ("s_lstm", "lstm"), n("s_lstm"), True)
        + _lin("summarizer.s_lstm.out", ("s_lstm", "out"))
        + _rnn("summarizer.vae.e_lstm.lstm", ("e_lstm", "lstm"), n("e_lstm"), False)
        + _lin("summarizer.vae.e_lstm.mu", ("e_lstm", "mu"))
        + _lin("summarizer.vae.e_lstm.logvar", ("e_lstm", "logvar"))
        + _rnn("summarizer.vae.d_lstm.lstm", ("d_lstm", "lstm"), n("d_lstm"), False)
        + _lin("summarizer.vae.d_lstm.recons", ("d_lstm", "recons"))
        + _rnn("gan.c_lstm.lstm", ("c_lstm", "lstm"), n("c_lstm"), False)
        + _lin("gan.c_lstm.out.0", ("c_lstm", "out"))
    )


def _rules_sumgan_att(tpl):
    sel, ae = "summarizer.selector", "summarizer.ae"
    rules = []
    for i in range(len(tpl["selector"]["layers"])):
        rules += _enc_layer(
            f"{sel}.transformer_encoder.layers.{i}", ("selector", "layers", i)
        )
    rules += _enc_layer(
        f"{sel}.transformer_encoder_layer", ("selector", "layers", 0), mode="alias"
    )
    rules += _ln(f"{sel}.transformer_encoder.norm", ("selector", "norm"))
    rules += _ln(f"{sel}.layer_norm", ("selector", "norm"), mode="alias")
    rules += _lin(f"{sel}.out.0", ("selector", "out"))
    for i in range(len(tpl["ae"]["enc"])):
        rules += _enc_layer(f"{ae}.transformer_encoder.layers.{i}", ("ae", "enc", i))
    rules += _enc_layer(
        f"{ae}.transformer_encoder_layer", ("ae", "enc", 0), mode="alias"
    )
    for i in range(len(tpl["ae"]["dec"])):
        rules += _dec_layer(f"{ae}.transformer_decoder.layers.{i}", ("ae", "dec", i))
    rules += _dec_layer(
        f"{ae}.transformer_decoder_layer", ("ae", "dec", 0), mode="alias"
    )
    n_c = len(tpl["c_lstm"]["lstm"]["layers"])
    rules += _rnn("gan.c_lstm.lstm", ("c_lstm", "lstm"), n_c, False)
    rules += _lin("gan.c_lstm.out.0", ("c_lstm", "out"))
    return rules


_RULES = {
    "logistic": _rules_logistic,
    "vasnet": _rules_vasnet,
    "transformer": _rules_transformer,
    "dsn": _rules_dsn,
    "sumgan": _rules_sumgan,
    "sumgan_att": _rules_sumgan_att,
}


# ----------------------------------------------------------------- hp infer
def infer_hp(model: str, sd: dict) -> dict:
    """Derive the architecture hyper-parameters a checkpoint's shapes pin
    down (hidden sizes, layer counts, cell type, learned pos-embeds), so
    ``import_state_dict`` can build a matching template without the user
    restating flags.  Attention head counts do not affect any param shape
    and stay at family defaults — pass hp explicitly to override."""
    hp: dict = {}

    def shape(k):
        return tuple(np.asarray(sd[k]).shape)

    def rnn_layers(prefix):
        n = 0
        while f"{prefix}.weight_ih_l{n}" in sd:
            n += 1
        return n

    def enc_layers(prefix):
        n = 0
        while f"{prefix}.layers.{n}.self_attn.in_proj_weight" in sd:
            n += 1
        return n

    if model == "logistic":
        hp["input_size"] = shape("perceptron.weight")[1]
    elif model == "vasnet":
        hp["input_size"] = shape("K.weight")[1]
        if "pos_embed.weight" in sd:
            hp["max_pos"] = shape("pos_embed.weight")[0]
            hp["pos_embed"] = "simple"
    elif model == "transformer":
        hp["input_size"] = shape("k1.weight")[1]
        hp["encoder_layers"] = enc_layers("transformer_encoder")
        if "pos_embed.weight" in sd:
            hp["max_pos"] = shape("pos_embed.weight")[0]
            hp["pos_embed"] = "simple"
    elif model == "dsn":
        out_gates, hidden = shape("rnn.weight_hh_l0")
        hp["input_size"] = shape("rnn.weight_ih_l0")[1]
        hp["hidden_size"] = hidden
        hp["num_layers"] = rnn_layers("rnn")
        hp["cell"] = "lstm" if out_gates == 4 * hidden else "gru"
    elif model == "sumgan":
        hp["input_size"] = shape("summarizer.s_lstm.lstm.weight_ih_l0")[1]
        hp["sLSTM_hidden_size"] = shape("summarizer.s_lstm.lstm.weight_hh_l0")[1]
        hp["sLSTM_num_layers"] = rnn_layers("summarizer.s_lstm.lstm")
        hp["edLSTM_hidden_size"] = shape("summarizer.vae.e_lstm.lstm.weight_hh_l0")[1]
        hp["edLSTM_num_layers"] = rnn_layers("summarizer.vae.e_lstm.lstm")
        hp["cLSTM_hidden_size"] = shape("gan.c_lstm.lstm.weight_hh_l0")[1]
        hp["cLSTM_num_layers"] = rnn_layers("gan.c_lstm.lstm")
    elif model == "sumgan_att":
        sel = "summarizer.selector"
        hp["input_size"] = shape(f"{sel}.out.0.weight")[1]
        hp["s_encoder_layers"] = enc_layers(f"{sel}.transformer_encoder")
        hp["ae_encoder_layers"] = enc_layers("summarizer.ae.transformer_encoder")
        hp["cLSTM_hidden_size"] = shape("gan.c_lstm.lstm.weight_hh_l0")[1]
        hp["cLSTM_num_layers"] = rnn_layers("gan.c_lstm.lstm")
    else:
        raise KeyError(
            f"cannot import weights for model {model!r}; choose from {IMPORTABLE}"
        )
    return hp


# ------------------------------------------------------------- tree plumbing
def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


# -------------------------------------------------------------------- public
def import_state_dict(model: str, state_dict: dict, hp: dict | None = None):
    """Convert a reference ``.pth`` state_dict into this framework's param
    pytree for ``model`` (a REGISTRY key).  Shapes are validated against a
    freshly initialized template; unknown keys raise (so a wrong ``-m`` is a
    loud error, not silent garbage)."""
    import jax
    import jax.numpy as jnp

    from summarizer_tpu.models import get_model

    if model not in _RULES:
        raise KeyError(
            f"cannot import weights for model {model!r}; choose from {IMPORTABLE}"
        )
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    hp = {**infer_hp(model, sd), **(hp or {})}
    # The import rules address per-layer ("layers", i) paths; build the
    # template in the list layout and convert to the scan_layers stacked
    # layout at the end if the caller trains with it.
    want_scan = bool(int(hp.pop("scan_layers", 0) or 0))
    tpl = get_model(model).module.init(jax.random.PRNGKey(0), hp)
    rules = _RULES[model](tpl)

    seen = set()
    for torch_key, path, kind, mode in rules:
        seen.add(torch_key)
        if mode == "alias":
            continue
        if torch_key not in sd:
            raise KeyError(f"{model}: state_dict is missing {torch_key!r}")
        v = _np(sd[torch_key])
        if kind == _T:
            v = v.T
        want = tuple(np.shape(_get(tpl, path)))
        if tuple(v.shape) != want:
            raise ValueError(
                f"{model}: {torch_key} has shape {tuple(v.shape)}, expected "
                f"{want} at {'/'.join(map(str, path))} (hp={hp})"
            )
        _set(tpl, path, jnp.asarray(v))
    unknown = sorted(set(sd) - seen)
    if unknown:
        raise KeyError(f"{model}: unrecognized state_dict keys: {unknown[:8]}")
    if want_scan and isinstance(tpl.get("layers"), list):
        from summarizer_tpu.models.transformer import stack_layers

        tpl["layers"] = stack_layers(tpl["layers"])
    return tpl


def export_state_dict(model: str, params) -> dict:
    """Inverse of :func:`import_state_dict`: emit a reference-keyed
    state_dict (numpy float32) from a param pytree, including the duplicate
    registrations (shared norms, deep-copied prototype layers) the
    reference's strict ``load_state_dict`` expects."""
    if model not in _RULES:
        raise KeyError(
            f"cannot export weights for model {model!r}; choose from {IMPORTABLE}"
        )
    if isinstance(params, dict) and isinstance(params.get("layers"), dict):
        # scan_layers stacked layout -> per-layer list for the export rules
        from summarizer_tpu.models.transformer import unstack_layers

        params = {**params, "layers": unstack_layers(params["layers"])}
    sd = {}
    for torch_key, path, kind, _mode in _RULES[model](params):
        v = np.asarray(_get(params, path), dtype=np.float32)
        sd[torch_key] = v.T if kind == _T else v
    return sd
