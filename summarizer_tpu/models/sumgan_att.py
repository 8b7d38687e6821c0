"""SumGAN-att: transformer selector + transformer autoencoder + cLSTM WGAN.

Ref: summarizer/models/sumgan_att.py:20-146 — the selector is a post-norm
transformer encoder with a final shared LayerNorm and sigmoid head; the
autoencoder is a full encoder-decoder transformer (decoder queries are the
*input* sequence attending to encoder memory, sumgan_att.py:74-80); the
discriminator reuses SumGAN's cLSTM (hidden 256 by default per the trainer,
sumgan_att.py:158).  Wasserstein losses live in train/adversarial.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from summarizer_tpu.models.sumgan import clstm_apply, clstm_init
from summarizer_tpu.nn.attention import (
    decoder_layer_apply,
    decoder_layer_init,
    encoder_layer_apply,
    encoder_layer_init,
)
from summarizer_tpu.nn.core import layer_norm, layer_norm_init, linear, linear_init

DEFAULTS = dict(
    input_size=1024,
    s_encoder_layers=2,
    s_attention_heads=4,
    ae_encoder_layers=2,
    ae_attention_heads=4,
    cLSTM_hidden_size=256,
    cLSTM_num_layers=2,
    epsilon=1e-5,
)


def selector_init(rng, d, n_layers):
    k = jax.random.split(rng, n_layers + 1)
    return {
        "layers": [encoder_layer_init(k[i], d, d) for i in range(n_layers)],
        "norm": layer_norm_init(d),
        "out": linear_init(k[-1], d, 1),
    }


def _auto_flash(x, heads, hp):
    """Same blockwise-attention policy as models/transformer.py: engage the
    Pallas flash kernel when head lanes align and T >= 1024 (or the hp
    forces it).  Round 5: the dense f32 [B, H, T, T] backward temps of this
    model's three attention stacks are 864 MB EACH at the LOL (B=6, T=3072)
    bucket — the deterministic RESOURCE_EXHAUSTED that livelocked the
    SumGAN-att x LOL sweep."""
    d = x.shape[-1]
    flash = (hp or {}).get("flash", "auto")
    lane_ok = d % heads == 0 and (d // heads) % 128 == 0
    return lane_ok and (
        x.shape[1] >= 1024 if flash == "auto" else bool(int(flash))
    )


def selector_apply(p, x, mask, heads, rng, train, eps=1e-5, flash=False):
    keys = jax.random.split(rng, len(p["layers"]))
    h = x
    for i, layer in enumerate(p["layers"]):
        h = encoder_layer_apply(layer, h, heads, mask, rng=keys[i], train=train, eps=eps,
                                flash=flash)
    h = layer_norm(p["norm"], h, eps)
    return jax.nn.sigmoid(linear(p["out"], h))[..., 0]


def ae_init(rng, d, n_layers):
    k = jax.random.split(rng, 2 * n_layers)
    return {
        "enc": [encoder_layer_init(k[i], d, d) for i in range(n_layers)],
        "dec": [decoder_layer_init(k[n_layers + i], d, d) for i in range(n_layers)],
    }


def ae_apply(p, x, mask, heads, rng, train, eps=1e-5, flash=False):
    keys = jax.random.split(rng, len(p["enc"]) + len(p["dec"]))
    mem = x
    for i, layer in enumerate(p["enc"]):
        mem = encoder_layer_apply(layer, mem, heads, mask, rng=keys[i], train=train, eps=eps,
                                  flash=flash)
    h = x  # decoder target is the raw input (sumgan_att.py:79)
    for i, layer in enumerate(p["dec"]):
        h = decoder_layer_apply(
            layer, h, mem, heads, mask, mask, rng=keys[len(p["enc"]) + i], train=train, eps=eps,
            flash=flash
        )
    return h


def init(rng, hp: dict):
    hp = {**DEFAULTS, **hp}
    d = int(hp["input_size"])
    k = jax.random.split(rng, 3)
    return {
        "selector": selector_init(k[0], d, int(hp["s_encoder_layers"])),
        "ae": ae_init(k[1], d, int(hp["ae_encoder_layers"])),
        "c_lstm": clstm_init(k[2], d, int(hp["cLSTM_hidden_size"]), int(hp["cLSTM_num_layers"])),
    }


def summarizer_forward(params, x, mask, rng, hp: dict, uniform: bool = False, train: bool = True):
    hp = {**DEFAULTS, **hp}
    k1, k2, k3 = jax.random.split(rng, 3)
    use_flash = _auto_flash(x, int(hp["s_attention_heads"]), hp)
    if uniform:
        scores = jax.random.uniform(k1, x.shape[:2])
    else:
        scores = selector_apply(
            params["selector"], x, mask, int(hp["s_attention_heads"]), k2, train, float(hp["epsilon"]),
            flash=use_flash,
        )
    x_weighted = x * (scores * mask)[..., None]
    x_hat = ae_apply(
        params["ae"], x_weighted, mask, int(hp["ae_attention_heads"]), k3, train, float(hp["epsilon"]),
        flash=_auto_flash(x, int(hp["ae_attention_heads"]), hp),
    )
    return x_hat, scores


def discriminate(params, x, mask):
    lengths = mask.sum(-1).astype(jnp.int32)
    return clstm_apply(params["c_lstm"], x, lengths)


def apply(params, x, mask, *, rng=None, train=False, hp: dict | None = None):
    hp = {**DEFAULTS, **(hp or {})}
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if mask is None:
        mask = jnp.ones(x.shape[:2], jnp.float32)
    return selector_apply(
        params["selector"], x, mask, int(hp["s_attention_heads"]), rng, train, float(hp["epsilon"]),
        flash=_auto_flash(x, int(hp["s_attention_heads"]), hp),
    )
