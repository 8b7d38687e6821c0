"""Mixture-of-experts transformer frame scorer (new model family).

Same scoring architecture as models/transformer.py — N post-norm encoder
layers, shared final/head LayerNorm, optional positional embeddings and
``more_residuals``, k1/relu/dropout/norm/k2/sigmoid head (reference
semantics: summarizer/models/transformer.py:18-103) — but each layer's
dense FFN is replaced by a top-k gated mixture of ``n_experts`` expert FFNs
(nn/moe.py), scaling parameter capacity O(E) with the same nominal
per-token compute.  The router's Switch load-balance loss is exposed via
``apply_with_aux`` and added to the training objective by the supervised
engine (weight ``aux_weight``); plain ``apply`` keeps the zoo ABI
((B, T, D), mask -> (B, T) scores in [0, 1]).

Expert parallelism: with ``--expert_parallel N`` the stacked expert bank's
leading E axis is sharded over an N-device ``ep`` mesh axis
(parallel/expert_parallel.py) via the ``moe_override`` hp hook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from summarizer_tpu.models.base import add_pos_embed, pos_embed_init, split_or_none
from summarizer_tpu.nn.attention import mha_apply, mha_init
from summarizer_tpu.nn.core import (
    dropout,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from summarizer_tpu.nn.moe import moe_ffn_apply, moe_ffn_init

DEFAULTS = dict(
    input_size=1024,
    encoder_layers=6,
    attention_heads=8,
    n_experts=4,
    top_k=2,
    aux_weight=0.01,
    more_residuals=False,
    max_pos=None,
    pos_embed="simple",
    epsilon=1e-5,
    dropout=0.1,
    head_dropout=0.5,
    flash="auto",  # same Pallas self-attention policy as models/transformer.py
)


def init(rng, hp: dict):
    hp = {**DEFAULTS, **hp}
    d = int(hp["input_size"])
    n_layers = int(hp["encoder_layers"])
    n_experts = int(hp["n_experts"])
    keys = split_or_none(rng, n_layers + 3)
    layers = []
    for i in range(n_layers):
        ka, km = jax.random.split(keys[i])
        layers.append(
            {
                "attn": mha_init(ka, d),
                "moe": moe_ffn_init(km, d, d, n_experts),
                "norm1": layer_norm_init(d),
                "norm2": layer_norm_init(d),
            }
        )
    params = {
        "layers": layers,
        "norm": layer_norm_init(d),  # shared final/head norm (ref quirk)
        "k1": linear_init(keys[n_layers], d, d),
        "k2": linear_init(keys[n_layers + 1], d, 1),
    }
    pe = pos_embed_init(keys[n_layers + 2], hp, d)
    if pe is not None:
        params["pos"] = pe
    return params


def _encoder_moe_layer(
    p, x, heads, mask, *, rng, train, rate, eps, flash, top_k, expert_override
):
    """Post-norm block with a MoE FFN: attn/residual/norm, moe/residual/norm
    (torch 1.3 TransformerEncoderLayer order, FFN swapped for the bank)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k = jax.random.split(rng, 3)
    a = mha_apply(
        p["attn"], x, x, x, heads, mask, rng=k[0], train=train,
        attn_dropout=rate, flash=flash,
    )
    x = layer_norm(p["norm1"], x + dropout(k[1], a, rate, train), eps)
    f, aux = moe_ffn_apply(
        p["moe"], x, mask, top_k=top_k, expert_override=expert_override
    )
    return layer_norm(p["norm2"], x + dropout(k[2], f, rate, train), eps), aux


def apply_with_aux(params, x, mask, *, rng=None, train=False, hp: dict | None = None):
    """Scores plus the mean router load-balance loss over layers."""
    hp = {**DEFAULTS, **(hp or {})}
    heads = int(hp["attention_heads"])
    eps = float(hp["epsilon"])
    rate = float(hp["dropout"])
    top_k = int(hp["top_k"])
    keys = split_or_none(rng, len(params["layers"]) + 1)

    flash = hp.get("flash", "auto")
    d = x.shape[-1]
    lane_ok = d % heads == 0 and (d // heads) % 128 == 0
    use_flash = lane_ok and (
        x.shape[1] >= 1024 if flash == "auto" else bool(int(flash))
    )
    expert_override = hp.get("moe_override")  # expert-parallel hook

    x = add_pos_embed(params.get("pos"), x)
    h = x
    aux_total = 0.0
    for i, layer in enumerate(params["layers"]):
        h, aux = _encoder_moe_layer(
            layer, h, heads, mask, rng=keys[i], train=train, rate=rate,
            eps=eps, flash=use_flash, top_k=top_k,
            expert_override=expert_override,
        )
        aux_total = aux_total + aux
    h = layer_norm(params["norm"], h, eps)
    if hp["more_residuals"]:
        h = h + x

    y = jax.nn.relu(linear(params["k1"], h))
    y = dropout(keys[-1], y, float(hp["head_dropout"]), train)
    y = layer_norm(params["norm"], y, eps)
    scores = jax.nn.sigmoid(linear(params["k2"], y))[..., 0]
    return scores, aux_total / len(params["layers"])


def apply(params, x, mask, *, rng=None, train=False, hp: dict | None = None):
    scores, _ = apply_with_aux(params, x, mask, rng=rng, train=train, hp=hp)
    return scores


def supervised_loss_extra(params, x, mask, *, rng, train, hp):
    """Hook for the supervised engine: run the forward once, return
    (scores, weighted_aux) so the router balance term joins the MSE."""
    hp = {**DEFAULTS, **(hp or {})}
    scores, aux = apply_with_aux(params, x, mask, rng=rng, train=train, hp=hp)
    return scores, float(hp["aux_weight"]) * aux
