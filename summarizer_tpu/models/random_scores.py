"""Random-scores baseline (ref: summarizer/models/rand.py:15-29)."""

from __future__ import annotations

import jax


def init(rng, hp: dict):
    del rng, hp
    return {}


def apply(params, x, mask, *, rng=None, train=False, hp=None):
    del params, train, hp
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return jax.random.uniform(rng, x.shape[:2])
