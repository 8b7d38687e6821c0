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


def kendall_masked(
    a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray, block: int = 512
) -> jnp.ndarray:
    """Kendall's tau-b over the valid entries of two 1D arrays, on device.

    tau_b = (P - Q) / sqrt((n0 - Tx)(n0 - Ty)) with average-tie corrections,
    matching ``scipy.stats.kendalltau`` (the reference's host path,
    summarizer/utils/eval.py:60-63; its double negation through rankdata is
    the identity on tau).  Pairwise O(F^2) sign products, evaluated in
    (block, F) tiles via ``lax.scan`` so frame-resolution videos (F ~ 10^4)
    never materialize an (F, F) matrix.
    """
    f = a.shape[0]
    nblk = -(-f // block)
    pad = nblk * block - f
    af = jnp.where(mask, a.astype(jnp.float32), 0.0)
    bf = jnp.where(mask, b.astype(jnp.float32), 0.0)
    mf = mask.astype(jnp.float32)
    if pad:
        zp = np.zeros(pad, np.float32)
        af = jnp.concatenate([af, zp])
        bf = jnp.concatenate([bf, zp])
        mf = jnp.concatenate([mf, zp])

    starts = np.arange(nblk, dtype=np.int32) * block

    def tile(carry, i0):
        pq, tx, ty = carry
        ab = jax.lax.dynamic_slice(af, (i0,), (block,))
        bb = jax.lax.dynamic_slice(bf, (i0,), (block,))
        mb = jax.lax.dynamic_slice(mf, (i0,), (block,))
        da = ab[:, None] - af[None, :]
        db = bb[:, None] - bf[None, :]
        m2 = mb[:, None] * mf[None, :]
        pq = pq + jnp.sum(jnp.sign(da) * jnp.sign(db) * m2)
        tx = tx + jnp.sum((da == 0.0) * m2)
        ty = ty + jnp.sum((db == 0.0) * m2)
        return (pq, tx, ty), None

    (pq, tx, ty), _ = jax.lax.scan(
        tile, (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)), starts
    )
    n = mf.sum()
    n0 = n * (n - 1.0) / 2.0
    tx = (tx - n) / 2.0  # remove the diagonal, halve ordered -> unordered
    ty = (ty - n) / 2.0
    return (pq / 2.0) / jnp.sqrt((n0 - tx) * (n0 - ty))  # 0/0 -> NaN as scipy


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
