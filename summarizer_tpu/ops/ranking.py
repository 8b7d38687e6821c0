"""Tie-aware rank statistics as pure jittable functions.

The reference leans on scipy's C implementations (``stats.rankdata`` with
average ties + ``stats.spearmanr``, summarizer/utils/eval.py:61-63).  These
device versions keep the exact average-tie semantics so full-dataset score
evaluation can run inside one compiled XLA program, vmapped over videos and
annotators.  scipy remains the test oracle (tests/test_ranking.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.float32(3.0e38)  # numpy, not jnp: device constants stall lowering over the TPU tunnel


def rankdata_masked(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Average-tie 1-based ranks of ``x`` restricted to ``mask`` (1D).

    Invalid positions receive arbitrary large ranks; callers must mask them
    out downstream.  Matches ``scipy.stats.rankdata(x[mask])`` on the valid
    entries.
    """
    n = x.shape[0]
    key = jnp.where(mask, x.astype(jnp.float32), _BIG)
    order = jnp.argsort(key)  # stable
    sx = key[order]
    # Group equal values: boundaries where the sorted value changes.
    newgrp = jnp.concatenate([np.ones(1, bool), sx[1:] != sx[:-1]])
    gid = jnp.cumsum(newgrp) - 1  # (n,) group id per sorted slot
    pos = np.arange(n, dtype=np.float32)
    first = jax.ops.segment_min(pos, gid, num_segments=n)
    last = jax.ops.segment_max(pos, gid, num_segments=n)
    rank_sorted = 0.5 * (first[gid] + last[gid]) + 1.0
    return jnp.asarray(np.zeros(n, np.float32)).at[order].set(rank_sorted)


def pearson_masked(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation over valid entries; NaN when either side is
    constant (scipy's behavior for degenerate inputs)."""
    m = mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    am = (a * m).sum() / n
    bm = (b * m).sum() / n
    da = (a - am) * m
    db = (b - bm) * m
    cov = (da * db).sum()
    va = (da * da).sum()
    vb = (db * db).sum()
    return cov / jnp.sqrt(va * vb)  # 0/0 -> NaN, matching scipy


def spearman_masked(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Spearman rho with average ties over the valid entries of two 1D arrays.

    The reference ranks the *negated* inputs before calling ``spearmanr``
    (summarizer/utils/eval.py:62-63); that double negation is the identity on
    the resulting rho, so ranks are taken directly here (verified against the
    composed scipy expression in tests).
    """
    ra = rankdata_masked(a, mask)
    rb = rankdata_masked(b, mask)
    return pearson_masked(ra, rb, mask)
