"""Transformer-encoder frame scorer.

Semantics of summarizer/models/transformer.py:18-103: N post-norm encoder
layers (default 6 layers / 8 heads / d_ff = input_size / dropout 0.1), a
final LayerNorm whose parameters are *shared* with the norm inside the FFN
head (the reference passes the same nn.LayerNorm instance to both,
transformer.py:48-50, 100), optional positional embeddings, an optional
extra residual around the whole encoder (``more_residuals``), then
k1 -> relu -> dropout(0.5) -> shared norm -> k2 -> sigmoid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from summarizer_tpu.models.base import add_pos_embed, pos_embed_init, split_or_none
from summarizer_tpu.nn.attention import encoder_layer_apply, encoder_layer_init
from summarizer_tpu.nn.core import dropout, layer_norm, layer_norm_init, linear, linear_init
from summarizer_tpu.nn.core import kaiming_uniform, xavier_uniform

DEFAULTS = dict(
    input_size=1024,
    encoder_layers=6,
    attention_heads=8,
    more_residuals=False,
    max_pos=None,
    pos_embed="simple",
    epsilon=1e-5,
    weight_init=None,
    dropout=0.1,
    head_dropout=0.5,
    flash="auto",  # Pallas blockwise self-attention (heads folded into the
    # batch axis, in-kernel dropout).  "auto" switches it on for long
    # sequences (T >= 1024, the LOL regime) where the dense path's
    # (B, H, T, T) probs tensor dominates HBM traffic; 1/0 force it.
    scan_layers=0,  # store the encoder stack as ONE stacked-(L, ...) pytree
    # and run it as a `lax.scan` instead of an unrolled Python loop: same
    # math and the same per-layer RNG stream, but the compiled program
    # contains the layer body ONCE.  The unrolled 6-layer fused whole-CV
    # program compiles to a ~39 MB executable (an ~8 min upload through the
    # tunneled TPU worker, cli/benchmark.py); the scanned one is a fraction
    # of that.  Checkpoints trained either way interconvert via
    # stack_layers/unstack_layers; torch import/export always uses the
    # per-layer (list) layout.
)


def stack_layers(layers: list):
    """List-of-layer-pytrees -> one pytree with a leading (L,) axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layers(stacked) -> list:
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]


def init(rng, hp: dict):
    hp = {**DEFAULTS, **hp}
    d = int(hp["input_size"])
    n_layers = int(hp["encoder_layers"])
    keys = split_or_none(rng, n_layers + 4)
    layers = [encoder_layer_init(keys[i], d, d) for i in range(n_layers)]

    wi = hp.get("weight_init")
    if wi:
        wi = str(wi).lower()
        init_fn = kaiming_uniform if wi in ("he", "kaiming") else xavier_uniform
        for i, layer in enumerate(layers):
            kk = jax.random.split(keys[i], 2)
            layer["lin1"]["w"] = init_fn(kk[0], layer["lin1"]["w"].shape)
            layer["lin2"]["w"] = init_fn(kk[1], layer["lin2"]["w"].shape)

    params = {
        # scan_layers stores the SAME per-layer values stacked on a leading
        # (L,) axis, so the two layouts are value-identical for a given rng.
        "layers": stack_layers(layers) if int(hp.get("scan_layers", 0)) else layers,
        "norm": layer_norm_init(d),  # shared: encoder final norm + head norm
        "k1": linear_init(keys[n_layers], d, d),
        "k2": linear_init(keys[n_layers + 1], d, 1),
    }
    if wi:
        kk = jax.random.split(keys[n_layers + 2], 2)
        init_fn = kaiming_uniform if wi in ("he", "kaiming") else xavier_uniform
        params["k1"]["w"] = init_fn(kk[0], params["k1"]["w"].shape)
        params["k2"]["w"] = init_fn(kk[1], params["k2"]["w"].shape)
    pe = pos_embed_init(keys[n_layers + 3], hp, d)
    if pe is not None:
        params["pos"] = pe
    return params


def apply(params, x, mask, *, rng=None, train=False, hp: dict | None = None):
    hp = {**DEFAULTS, **(hp or {})}
    heads = int(hp["attention_heads"])
    eps = float(hp["epsilon"])
    rate = float(hp["dropout"])
    layers = params["layers"]
    stacked = isinstance(layers, dict)  # scan_layers layout (leading L axis)
    n_layers = (
        jax.tree.leaves(layers)[0].shape[0] if stacked else len(layers)
    )
    keys = split_or_none(rng, n_layers + 1)

    flash = hp.get("flash", "auto")
    d = x.shape[-1]
    lane_ok = d % heads == 0 and (d // heads) % 128 == 0
    use_flash = lane_ok and (
        x.shape[1] >= 1024 if flash == "auto" else bool(int(flash))
    )
    override = hp.get("attention_override")  # sequence-parallel hook

    x = add_pos_embed(params.get("pos"), x)
    h = x
    if stacked:

        def body(h, inp):
            layer, k = inp
            h = encoder_layer_apply(
                layer, h, heads, mask, rng=k, train=train, rate=rate,
                eps=eps, flash=use_flash, attention_override=override,
            )
            return h, None

        h, _ = jax.lax.scan(body, h, (layers, keys[:n_layers]))
    else:
        for i, layer in enumerate(layers):
            h = encoder_layer_apply(
                layer, h, heads, mask, rng=keys[i], train=train, rate=rate,
                eps=eps, flash=use_flash, attention_override=override,
            )
    h = layer_norm(params["norm"], h, eps)
    if hp["more_residuals"]:
        h = h + x

    y = jax.nn.relu(linear(params["k1"], h))
    y = dropout(keys[-1], y, float(hp["head_dropout"]), train)
    y = layer_norm(params["norm"], y, eps)
    return jax.nn.sigmoid(linear(params["k2"], y))[..., 0]
