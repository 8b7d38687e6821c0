"""Batched on-device evaluation pipeline.

Jittable, statically-shaped equivalents of the reference eval stack
(summarizer/utils/eval.py:15-166 and models/__init__.py:60-119), vmapped over
videos so the whole test fold — upsample, Spearman vs every annotator,
segment pooling, 0/1-knapsack DP, keyshot F1 — runs as one XLA program.

Shape conventions (padded, with masks):
  B = videos, S = feature steps, G = segments, U = annotators, F = frames.
All arrays are padded to the max over the evaluated set; per-video true sizes
ride along as int32 scalars.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from summarizer_tpu.ops.ranking import (
    kendall_masked,
    pearson_masked,
    rankdata_masked,
)


class EvalBatch(NamedTuple):
    """Device-resident eval inputs for a set of videos (padded)."""

    positions: jnp.ndarray  # (B, S) int32 subsampled frame indices ("picks")
    n_steps: jnp.ndarray  # (B,) int32
    n_frames: jnp.ndarray  # (B,) int32
    cps: jnp.ndarray  # (B, G, 2) int32 inclusive segment bounds
    nfps: jnp.ndarray  # (B, G) int32 frames per segment (0 on padding)
    n_segs: jnp.ndarray  # (B,) int32
    user_scores: jnp.ndarray  # (B, U, F) f32 per-annotator frame scores
    user_summary: jnp.ndarray  # (B, U, F) f32 per-annotator binary summaries
    n_users: jnp.ndarray  # (B,) int32 valid rows of user_scores
    n_summary_users: jnp.ndarray  # (B,) int32 valid rows of user_summary —
    # independent of n_users: real SumMe pairs 15-18 /user_summary annotators
    # with ONE /user_scores pseudo-user (datasets/README.md:54-74)
    user_ranks: jnp.ndarray  # (B, U, F) f32 average-tie ranks of user_scores
    # over the valid frames — precomputed at pack time because annotations
    # never change across a run, so each eval ranks only the machine side
    # (a ~U-fold cut in per-eval sort work; see eval_scores_video).


def upsample_step(scores, positions, n_steps, n_frames, out_frames: int):
    """Right-open step-function expansion of per-step scores to frames.

    Frame f in [positions[i], positions[i+1]) gets scores[i]; frames past
    n_frames (or before positions[0]) are zero.  Semantics of
    summarizer/utils/eval.py:15-35 under padding.
    """
    f = np.arange(out_frames, dtype=np.int32)
    # Push padded positions beyond any frame index so they never match.
    step_ids = np.arange(positions.shape[0], dtype=np.int32)
    pos = jnp.where(step_ids < n_steps, positions, jnp.int32(2**30))
    idx = jnp.searchsorted(pos, f, side="right").astype(jnp.int32) - 1
    valid = (idx >= 0) & (idx < n_steps) & (f < n_frames)
    return jnp.where(valid, scores[jnp.clip(idx, 0, scores.shape[0] - 1)], 0.0)


def eval_scores_video(frame_scores, user_scores, user_ranks, n_users, n_frames,
                      metric="spearmanr"):
    """Mean rank correlation of machine frame scores vs each annotator
    (ref: models/__init__.py:60-86); ``metric``: spearmanr | kendalltau.

    Spearman ranks the machine scores ONCE per video and correlates against
    the pack-time user ranks — ranking both sides per (video, user) pair
    made U redundant O(F log F) sorts the dominant cost of the eval program.
    Rank values at masked positions differ between the two rankers, but
    pearson_masked zeroes them, so the rho is bit-identical to the
    rank-both-sides form (pinned in tests/test_eval_parity.py)."""
    fmask = np.arange(frame_scores.shape[0]) < n_frames
    umask = np.arange(user_scores.shape[0]) < n_users
    if metric == "kendalltau":
        rhos = jax.vmap(lambda u: kendall_masked(frame_scores, u, fmask))(user_scores)
    else:
        machine_ranks = rankdata_masked(frame_scores, fmask)
        rhos = jax.vmap(lambda ru: pearson_masked(machine_ranks, ru, fmask))(user_ranks)
    return jnp.sum(jnp.where(umask, rhos, 0.0)) / jnp.maximum(n_users, 1)


def segment_means(frame_scores, cps, n_segs):
    """Per-segment mean of frame scores over inclusive [start, end] bounds
    (ref: summarizer/utils/eval.py:90-94)."""
    csum = jnp.concatenate([np.zeros(1, np.float32), jnp.cumsum(frame_scores)])
    start = cps[:, 0]
    end1 = cps[:, 1] + 1
    tot = csum[end1] - csum[start]
    cnt = jnp.maximum(end1 - start, 1).astype(frame_scores.dtype)
    means = tot / cnt
    return jnp.where(np.arange(cps.shape[0]) < n_segs, means, 0.0)


def knapsack_picks(values_int, weights, n_items, capacity, max_capacity: int):
    """Exact batched-free 0/1-knapsack for one video via ``lax.scan`` over
    items, vectorized across the capacity axis on the VPU.

    Matches the host DP traceback (ops/knapsack.py): an item is kept only
    where taking it strictly improved the row.  ``max_capacity`` is the
    static DP width; ``capacity`` the video's true budget
    (floor(0.15 * n_frames), summarizer/utils/eval.py:96-99).
    """
    C = max_capacity
    cap_axis = np.arange(C + 1, dtype=np.int32)

    def item_step(dp, inp):
        v, w, valid = inp
        src = cap_axis - w
        cand = dp[jnp.clip(src, 0)] + v
        better = (src >= 0) & (cand > dp) & valid & (w > 0)
        return jnp.where(better, cand, dp), better

    n_ids = np.arange(values_int.shape[0], dtype=np.int32)
    valid_items = n_ids < n_items
    dp0 = jnp.asarray(np.zeros(C + 1, np.int32))
    _, keep = jax.lax.scan(
        item_step, dp0, (values_int.astype(jnp.int32), weights.astype(jnp.int32), valid_items)
    )

    def traceback(c, inp):
        keep_row, w = inp
        take = keep_row[jnp.clip(c, 0)] & (c >= 0)
        return c - jnp.where(take, w, 0), take

    _, picks_rev = jax.lax.scan(
        traceback,
        jnp.minimum(capacity, C).astype(jnp.int32),
        (keep[::-1], weights[::-1].astype(jnp.int32)),
    )
    return picks_rev[::-1]


def rank_greedy_picks(seg_scores, weights, n_items, capacity):
    """Greedy selection by descending score with the reference's strict
    ``total + w < limit`` test and skip-not-stop behavior
    (summarizer/utils/eval.py:102-109)."""
    g = seg_scores.shape[0]
    valid = np.arange(g) < n_items
    key = jnp.where(valid, seg_scores, -jnp.inf)
    # The reference orders with np.argsort(x)[::-1] (eval.py:103): a reversed
    # stable ascending sort, so tied scores are visited highest-index first.
    order = jnp.argsort(key)[::-1]

    def step(total, i):
        w = weights[i]
        ok = valid[i] & (total + w < capacity)
        return total + jnp.where(ok, w, 0), ok

    _, picked_sorted = jax.lax.scan(step, jnp.int32(0), order)
    return jnp.asarray(np.zeros(g, bool)).at[order].set(picked_sorted)


def summary_from_picks(picks, nfps, n_segs, out_frames: int):
    """Binary frame vector: frame f is kept iff its segment is picked.

    The reference concatenates per-segment 0/1 runs (eval.py:111-123); the
    device version assigns each frame its segment id from cumulative segment
    lengths.  Frames beyond sum(nfps) are zero (evaluate_summary pads/clips
    anyway, eval.py:139-145).
    """
    nf = jnp.where(np.arange(nfps.shape[0]) < n_segs, nfps, 0)
    bounds = jnp.cumsum(nf)  # (G,) exclusive upper bound per segment
    f = np.arange(out_frames, dtype=np.int32)
    seg = jnp.searchsorted(bounds, f, side="right").astype(jnp.int32)
    in_range = f < bounds[-1] if nfps.shape[0] > 0 else jnp.zeros_like(f, bool)
    return jnp.where(
        in_range, picks[jnp.clip(seg, 0, picks.shape[0] - 1)].astype(jnp.float32), 0.0
    )


def eval_summary_video(machine_summary, user_summary, n_users, n_frames):
    """(avg F1, max F1) over annotators for one video
    (ref: summarizer/utils/eval.py:125-166)."""
    fmask = (np.arange(machine_summary.shape[0]) < n_frames).astype(jnp.float32)
    m = (machine_summary > 0).astype(jnp.float32) * fmask
    u = (user_summary > 0).astype(jnp.float32) * fmask[None, :]
    overlap = (u * m[None, :]).sum(-1)
    prec = overlap / (m.sum() + 1e-8)
    rec = overlap / (u.sum(-1) + 1e-8)
    f1 = jnp.where((prec == 0) & (rec == 0), 0.0, 2 * prec * rec / (prec + rec))
    umask = np.arange(user_summary.shape[0]) < n_users
    avg = jnp.sum(jnp.where(umask, f1, 0.0)) / jnp.maximum(n_users, 1)
    mx = jnp.max(jnp.where(umask, f1, -jnp.inf))
    return avg, mx


@partial(
    jax.jit,
    static_argnames=("proportion", "method", "max_capacity", "out_frames", "metric"),
)
def evaluate_batch(
    scores: jnp.ndarray,  # (B, S) per-step model scores
    batch: EvalBatch,
    *,
    proportion: float = 0.15,
    method: str = "knapsack",
    max_capacity: int,
    out_frames: int,
    metric: str = "spearmanr",
):
    """Full test-fold evaluation on device.

    Returns per-video (corr, avg_f1, max_f1); the caller averages over videos
    exactly as models/__init__.py:84-86 and :117-119 do.
    """

    def one(video_scores, pos, n_steps, n_frames, cps, nfps, n_segs, uscores,
            usumm, n_users, n_summ_users, uranks):
        fs = upsample_step(video_scores, pos, n_steps, n_frames, out_frames)
        corr = eval_scores_video(fs, uscores, uranks, n_users, n_frames, metric)

        seg = segment_means(fs, cps, n_segs)
        limit = jnp.floor(n_frames.astype(jnp.float32) * proportion).astype(jnp.int32)
        if method == "knapsack":
            vals = (seg * 1000.0).astype(jnp.int32)  # trunc toward zero, knapsack.py:12-15
            picks = knapsack_picks(vals, nfps, n_segs, limit, max_capacity)
        elif method == "rank":
            picks = rank_greedy_picks(seg, nfps, n_segs, limit)
        else:
            raise KeyError(f"Unknown method {method}")
        ms = summary_from_picks(picks, nfps, n_segs, out_frames)
        avg_f1, max_f1 = eval_summary_video(ms, usumm, n_summ_users, n_frames)
        return corr, avg_f1, max_f1

    return jax.vmap(one)(
        scores,
        batch.positions,
        batch.n_steps,
        batch.n_frames,
        batch.cps,
        batch.nfps,
        batch.n_segs,
        batch.user_scores,
        batch.user_summary,
        batch.n_users,
        batch.n_summary_users,
        batch.user_ranks,
    )
