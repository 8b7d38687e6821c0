"""Per-frame logistic-regression scorer: one 1024->1 linear + sigmoid
(ref: summarizer/models/logistic.py:15-35). A single fused MXU matmul."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from summarizer_tpu.nn.core import linear, linear_init


def init(rng, hp: dict):
    return {"head": linear_init(rng, int(hp.get("input_size", 1024)), 1)}


def apply(params, x, mask, *, rng=None, train=False, hp=None):
    del mask, rng, train, hp
    return jax.nn.sigmoid(linear(params["head"], x))[..., 0]
