"""Shared model-zoo plumbing.

Zoo ABI (every model): ``init(rng, hp) -> params`` and
``apply(params, x[B,T,D], mask[B,T], *, rng, train) -> scores[B,T]`` in [0,1].
This replaces the reference's ``(seq_len, batch, 1024) -> (seq_len, batch, 1)``
convention (docstring contract repeated in every model, e.g. summarizer/
models/rand.py:20-25) with batch-major padded tensors + masks, the shape
XLA/MXU wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from summarizer_tpu.nn.core import embedding_init, sinusoid_pos_embed


def pos_embed_init(rng, hp: dict, input_size: int):
    """Optional positional embeddings, as in summarizer/models/vasnet.py:36-50:
    ``max_pos`` enables them, ``pos_embed`` picks learned ("simple") or the
    reference's sin/cos table ("attention").

    The kind is encoded structurally (``emb`` = learned, ``table`` = fixed
    sin/cos) — a string leaf in the params pytree would abort every jitted
    program that takes params as an argument."""
    max_len = hp.get("max_pos")
    if not max_len:
        return None
    kind = hp.get("pos_embed", "simple")
    if kind == "simple":
        return {"emb": embedding_init(rng, int(max_len), input_size)}
    if kind == "attention":
        return {"table": jnp.asarray(sinusoid_pos_embed(int(max_len), input_size))}
    return None


def add_pos_embed(pe, x):
    t = x.shape[1]
    if pe is None:
        return x
    if "emb" in pe:  # learned ("simple")
        return x + pe["emb"]["table"][:t][None]
    return x + pe["table"][:t][None]


def split_or_none(rng, n: int):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return jax.random.split(rng, n)
