"""Masked multi-head attention and transformer layers.

Semantics follow the torch layers the reference instantiates
(nn.MultiheadAttention / nn.TransformerEncoderLayer / DecoderLayer with
post-norm residuals and ReLU FFNs, summarizer/models/transformer.py:49-50,
sumgan_att.py:25-32, :54-69), generalized with key-padding masks: the
reference ran batch-1 unpadded sequences, here padded batches attend only to
valid keys.  All contractions are einsums XLA fuses onto the MXU; a Pallas
flash-attention path for long sequences lives in ops/flash_attention.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from summarizer_tpu.nn.core import (
    dropout,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    xavier_uniform,
)

_NEG_INF = np.float32(-1e30)  # numpy, not jnp: device constants stall lowering


def mha_init(rng, d_model: int, bias: bool = True):
    """torch nn.MultiheadAttention init: xavier-uniform packed in-proj,
    zero in-proj/out-proj biases, default-init out-proj weight."""
    k1, k2 = jax.random.split(rng)
    p = {
        "w_in": xavier_uniform(k1, (d_model, 3 * d_model)),
        "out": linear_init(k2, d_model, d_model, bias=False, w_init="torch"),
    }
    if bias:
        p["b_in"] = jnp.zeros((3 * d_model,), jnp.float32)
    p["out"]["b"] = jnp.zeros((d_model,), jnp.float32)
    return p


def mha_apply(
    p,
    query,
    key,
    value,
    n_heads: int,
    key_mask=None,
    *,
    rng=None,
    train: bool = False,
    attn_dropout: float = 0.0,
    flash: bool = False,
    attention_override=None,
):
    """(B, Tq, D) x (B, Tk, D) -> (B, Tq, D). ``key_mask``: (B, Tk) validity.

    ``flash=True`` routes self-attention through the Pallas blockwise kernel
    (ops/flash_attention.py) with heads folded into the batch axis — O(T)
    memory instead of materializing the (B, H, T, T) probs tensor, with
    in-kernel attention dropout (torch semantics).  Requires square
    self-attention shapes and a lane-aligned head dim; otherwise the dense
    einsum path runs.

    ``attention_override(q, k, v, lengths, seeds, scale, dropout_rate)``
    replaces the kernel call on the head-folded (B*H, T, hd) tensors — the
    sequence-parallel hook (parallel/sequence_parallel.py), which shards T
    over the mesh."""
    d = query.shape[-1]
    hd = d // n_heads
    w_q, w_k, w_v = jnp.split(p["w_in"], 3, axis=1)
    if "b_in" in p:
        b_q, b_k, b_v = jnp.split(p["b_in"], 3)
    else:
        b_q = b_k = b_v = 0.0

    def heads(x, w, b):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        b_, t_, _ = y.shape
        return y.reshape(b_, t_, n_heads, hd)

    blockwise = query.shape == key.shape and (
        attention_override is not None or (flash and hd % 128 == 0)
    )
    if blockwise:
        from summarizer_tpu.ops.flash_attention import flash_attention

        bsz, t = query.shape[0], query.shape[1]
        # fold heads into batch: (B, T, H, hd) -> (B*H, T, hd)
        qf = heads(query, w_q, b_q).transpose(0, 2, 1, 3).reshape(-1, t, hd)
        kf = heads(key, w_k, b_k).transpose(0, 2, 1, 3).reshape(-1, t, hd)
        vf = heads(value, w_v, b_v).transpose(0, 2, 1, 3).reshape(-1, t, hd)
        lengths = (
            key_mask.sum(-1).astype(jnp.int32)
            if key_mask is not None
            else jnp.full((bsz,), t, jnp.int32)
        )
        lengths = jnp.repeat(lengths, n_heads)
        if train and attn_dropout > 0.0:
            seeds = jax.random.randint(
                rng, (bsz * n_heads,), 0, np.int32(2**31 - 1), dtype=jnp.int32
            )
            rate = float(attn_dropout)
        else:
            seeds, rate = None, 0.0
        if attention_override is not None:
            ctx = attention_override(
                qf, kf, vf, lengths, seeds, 1.0 / math.sqrt(hd), rate
            )
        else:
            ctx = flash_attention(
                qf, kf, vf, lengths, seeds, 1.0 / math.sqrt(hd), None, False, rate
            )
        ctx = ctx.reshape(bsz, n_heads, t, hd).transpose(0, 2, 1, 3).reshape(bsz, t, d)
        return linear(p["out"], ctx)

    q = heads(query, w_q, b_q) * np.float32(1.0 / np.sqrt(hd))
    k = heads(key, w_k, b_k)
    v = heads(value, w_v, b_v)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :] > 0, logits, _NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    if train and attn_dropout > 0.0:
        attn = dropout(rng, attn, attn_dropout, train)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    ctx = ctx.reshape(query.shape[0], query.shape[1], d)
    return linear(p["out"], ctx)


# ------------------------------------------------------- transformer layers
def encoder_layer_init(rng, d_model: int, d_ff: int):
    k = jax.random.split(rng, 3)
    return {
        "attn": mha_init(k[0], d_model),
        "lin1": linear_init(k[1], d_model, d_ff),
        "lin2": linear_init(k[2], d_ff, d_model),
        "norm1": layer_norm_init(d_model),
        "norm2": layer_norm_init(d_model),
    }


def encoder_layer_apply(
    p,
    x,
    n_heads: int,
    mask=None,
    *,
    rng=None,
    train: bool = False,
    rate: float = 0.1,
    eps: float = 1e-5,
    flash: bool = False,
    attention_override=None,
):
    """Post-norm encoder block (torch 1.3 TransformerEncoderLayer order)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k = jax.random.split(rng, 4)
    a = mha_apply(
        p["attn"], x, x, x, n_heads, mask, rng=k[0], train=train,
        attn_dropout=rate, flash=flash, attention_override=attention_override,
    )
    x = layer_norm(p["norm1"], x + dropout(k[1], a, rate, train), eps)
    f = linear(p["lin2"], dropout(k[2], jax.nn.relu(linear(p["lin1"], x)), rate, train))
    return layer_norm(p["norm2"], x + dropout(k[3], f, rate, train), eps)


def decoder_layer_init(rng, d_model: int, d_ff: int):
    k = jax.random.split(rng, 4)
    return {
        "self_attn": mha_init(k[0], d_model),
        "cross_attn": mha_init(k[1], d_model),
        "lin1": linear_init(k[2], d_model, d_ff),
        "lin2": linear_init(k[3], d_ff, d_model),
        "norm1": layer_norm_init(d_model),
        "norm2": layer_norm_init(d_model),
        "norm3": layer_norm_init(d_model),
    }


def decoder_layer_apply(
    p,
    tgt,
    memory,
    n_heads: int,
    tgt_mask=None,
    mem_mask=None,
    *,
    rng=None,
    train: bool = False,
    rate: float = 0.1,
    eps: float = 1e-5,
    flash: bool = False,
):
    """Post-norm decoder block: self-attn, cross-attn, FFN (torch order).
    The reference uses no causal mask (sumgan_att.py:74-80), so ``flash``
    routes BOTH attentions through the blockwise kernel — cross-attention
    qualifies because tgt and memory share (B, T, D) here and the kernel
    never assumes q is k."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k = jax.random.split(rng, 6)
    a = mha_apply(
        p["self_attn"], tgt, tgt, tgt, n_heads, tgt_mask, rng=k[0], train=train,
        attn_dropout=rate, flash=flash,
    )
    x = layer_norm(p["norm1"], tgt + dropout(k[1], a, rate, train))
    c = mha_apply(
        p["cross_attn"], x, memory, memory, n_heads, mem_mask, rng=k[2], train=train,
        attn_dropout=rate, flash=flash,
    )
    x = layer_norm(p["norm2"], x + dropout(k[3], c, rate, train))
    f = linear(p["lin2"], dropout(k[4], jax.nn.relu(linear(p["lin1"], x)), rate, train))
    return layer_norm(p["norm3"], x + dropout(k[5], f, rate, train))
