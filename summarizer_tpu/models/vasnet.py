"""VASNet-style single-head soft self-attention scorer.

Semantics of summarizer/models/vasnet.py:17-148: bias-free K/Q/V/out
projections, configurable logit scale (default 1/sqrt(d), VASNet's paper
value 0.06 via ``scale``), optional self-exclusion, optional *local attention
aperture* (banded mask over [t-w, t+w] — the reference's long-sequence
mechanism, kept as a first-class option), optional positional embeddings,
dropout(0.5), residual + LayerNorm, 2-layer FFN head with 0.1-constant
biases and a sigmoid.  The reference reuses one LayerNorm instance at both
normalization points; that parameter sharing is reproduced.

Banded + padded attention masking is new (the reference ran unpadded batch-1).
The reference's quirk of masking *zero-valued* in-band logits along with the
out-of-band ones (vasnet.py:124-127 multiplies tril by triu and tests == 0)
is fixed here: the band is positional, |i-j| <= aperture.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from summarizer_tpu.models.base import add_pos_embed, pos_embed_init, split_or_none
from summarizer_tpu.nn.core import dropout, layer_norm, layer_norm_init, linear, linear_init

_NEG_INF = np.float32(-1e30)  # numpy, not jnp: device constants stall lowering

DEFAULTS = dict(
    input_size=1024,
    max_pos=None,
    pos_embed="simple",
    ignore_self=False,
    local=None,  # attention aperture w
    scale=None,
    epsilon=1e-6,
    weight_init="xavier",
    dropout=0.5,
    flash="auto",  # Pallas blockwise attention: "auto" | 1 | 0.  "auto"
    # switches the kernel on for long sequences (T >= 1024, the LOL regime):
    # measured on the v5e, dense XLA attention is ~1.5x FASTER at TVSum
    # scale (T=320: 7794 vs 5268 videos/s eval, 4455 vs 3722 train — the
    # banded grid and streaming softmax only pay off once the (T, T) probs
    # tensor dominates HBM traffic), while flash is 119x at T~3.2k.  Both
    # training (in-kernel hash dropout, torch semantics) and eval use the
    # same policy; flash=1/0 force a path.
)

FLASH_AUTO_MIN_T = 1024  # measured dense/flash crossover (see BENCH_NOTES)


def init(rng, hp: dict):
    hp = {**DEFAULTS, **hp}
    d = int(hp["input_size"])
    k = split_or_none(rng, 8)
    wi = str(hp["weight_init"]).lower()
    if wi in ("he", "kaiming"):
        proj = dict(w_init="kaiming")
    else:
        proj = dict(w_init="xavier", gain=math.sqrt(2.0))
    params = {
        "K": linear_init(k[0], d, d, bias=False, **proj),
        "Q": linear_init(k[1], d, d, bias=False, **proj),
        "V": linear_init(k[2], d, d, bias=False, **proj),
        "out": linear_init(k[3], d, d, bias=False, **proj),
        "k1": linear_init(k[4], d, d, **proj),
        "k2": linear_init(k[5], d, 1, **proj),
        "norm": layer_norm_init(d),  # shared at both norm sites (vasnet.py:53)
    }
    params["k1"]["b"] = jnp.full((d,), 0.1, jnp.float32)
    params["k2"]["b"] = jnp.full((1,), 0.1, jnp.float32)
    pe = pos_embed_init(k[6], hp, d)
    if pe is not None:
        params["pos"] = pe
    return params


def apply(params, x, mask, *, rng=None, train=False, hp: dict | None = None):
    hp = {**DEFAULTS, **(hp or {})}
    d = x.shape[-1]
    # extra-params arrive as CLI strings; coerce numerics
    scale = float(hp["scale"]) if hp["scale"] is not None else 1.0 / math.sqrt(d)
    rate = float(hp["dropout"])
    eps = float(hp["epsilon"])
    k = split_or_none(rng, 3)

    x = add_pos_embed(params.get("pos"), x)

    q = linear(params["Q"], x)
    kk = linear(params["K"], x)
    v = linear(params["V"], x)

    t = x.shape[1]
    aperture = int(hp["local"]) if hp["local"] is not None else None
    dropout_active = train and rate > 0.0
    flash = hp.get("flash", "auto")
    override = hp.get("attention_override")  # sequence-parallel hook
    want_flash = (
        (t >= FLASH_AUTO_MIN_T) if flash == "auto" else bool(int(flash))
    ) or override is not None
    if want_flash:
        from summarizer_tpu.ops.flash_attention import flash_attention

        lengths = (
            mask.sum(-1).astype(jnp.int32)
            if mask is not None
            else np.full((x.shape[0],), t, np.int32)
        )
        if dropout_active:
            seeds = jax.random.randint(
                k[0], (x.shape[0],), 0, np.int32(2**31 - 1), dtype=jnp.int32
            )
            drate = rate
        else:
            seeds = None
            drate = 0.0
        if override is not None:
            ctx = override(
                q, kk, v, lengths, seeds, float(scale), aperture,
                bool(hp["ignore_self"]), drate,
            )
        else:
            ctx = flash_attention(
                q, kk, v, lengths, seeds, float(scale), aperture,
                bool(hp["ignore_self"]), drate,
            )
    else:
        logits = jnp.einsum("bqd,bkd->bqk", q, kk) * scale
        if mask is not None:
            logits = jnp.where(mask[:, None, :] > 0, logits, _NEG_INF)
        if hp["ignore_self"]:
            logits = jnp.where(np.eye(t, dtype=bool)[None], _NEG_INF, logits)
        if aperture is not None:
            ij = np.arange(t)
            band = np.abs(ij[:, None] - ij[None, :]) <= aperture
            logits = jnp.where(band[None], logits, _NEG_INF)
        alpha = jax.nn.softmax(logits, axis=-1)
        alpha = dropout(k[0], alpha, rate, train)
        ctx = jnp.einsum("bqk,bkd->bqd", alpha, v)
    c = linear(params["out"], ctx)

    y = layer_norm(params["norm"], dropout(k[1], c + x, rate, train), eps)
    y = layer_norm(params["norm"], dropout(k[2], jax.nn.relu(linear(params["k1"], y)), rate, train), eps)
    return jax.nn.sigmoid(linear(params["k2"], y))[..., 0]
