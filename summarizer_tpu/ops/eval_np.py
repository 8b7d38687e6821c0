"""Host-side oracle implementations of the evaluation pipeline.

These reproduce, with vectorized numpy, the exact observable behavior of the
reference ops in summarizer/utils/eval.py:15-166 (upsample step-function,
Spearman/Kendall on negated average-tie ranks, segment mean pooling, knapsack
or greedy-rank keyshot selection, multi-user precision/recall/F1 with 1e-8
epsilons).  They serve as the correctness oracle for the jitted device path
(ops/eval_jax.py) and as the host fallback for tiny workloads.
"""

from __future__ import annotations

import math

import numpy as np
from scipy import stats

from summarizer_tpu.ops.knapsack import knapsack_solve


def upsample(scores: np.ndarray, n_frames: int, positions: np.ndarray) -> np.ndarray:
    """Expand per-step scores to per-frame scores as a right-open step function.

    Frame ``f`` in ``[positions[i], positions[i+1])`` receives ``scores[i]``;
    a terminal boundary ``n_frames`` is appended when missing, and any step
    beyond ``len(scores)`` contributes zeros (ref: summarizer/utils/eval.py:15-35).
    """
    scores = np.asarray(scores).reshape(-1)
    positions = np.asarray(positions).reshape(-1)
    if positions.dtype.kind != "i":
        positions = positions.astype(np.int32)
    n_frames = int(n_frames)
    if len(positions) == 0 or positions[-1] != n_frames:
        positions = np.concatenate([positions, [n_frames]])

    out = np.zeros(n_frames, dtype=np.float32)
    n_steps = len(positions) - 1
    for i in range(n_steps):
        lo, hi = int(positions[i]), int(positions[i + 1])
        out[lo:hi] = 0.0 if i >= len(scores) else scores[i]
    return out


def generate_scores(probs: np.ndarray, n_frames: int, positions: np.ndarray) -> np.ndarray:
    """Per-frame machine scores for comparison with per-frame annotations
    (ref: summarizer/utils/eval.py:37-47)."""
    return upsample(probs, n_frames, positions)


def evaluate_scores(
    machine_scores: np.ndarray, user_scores: np.ndarray, metric: str = "spearmanr"
) -> float:
    """Mean rank correlation between machine scores and each annotator's scores.

    Matches summarizer/utils/eval.py:49-72: correlation is computed on
    average-tie ranks of the *negated* arrays (a no-op for Spearman, kept for
    parity), then averaged over annotators.
    """
    if metric == "spearmanr":
        corr_fn = lambda a, b: stats.spearmanr(a, b)[0]
    elif metric == "kendalltau":
        corr_fn = lambda a, b: stats.kendalltau(a, b)[0]
    else:
        raise KeyError(f"Unknown metric {metric}")
    mr = stats.rankdata(-np.asarray(machine_scores))
    corrs = [
        corr_fn(mr, stats.rankdata(-np.asarray(u))) for u in np.asarray(user_scores)
    ]
    return float(np.mean(corrs))


def _segment_means(frame_scores: np.ndarray, cps: np.ndarray) -> np.ndarray:
    """Mean per-frame score within each [start, end] (inclusive) KTS segment
    (ref: summarizer/utils/eval.py:90-94)."""
    cps = np.asarray(cps)
    return np.array(
        [
            float(np.mean(frame_scores[int(s) : int(e) + 1]))
            for s, e in zip(cps[:, 0], cps[:, 1])
        ],
        dtype=np.float64,
    )


def select_segments(
    seg_scores: np.ndarray, nfps: np.ndarray, limit: int, method: str = "knapsack"
) -> list[int]:
    """Pick segment indices under a frame budget.

    ``knapsack``: exact 0/1-knapsack DP, values = floor-truncated 1000x scores
    (summarizer/utils/knapsack.py:12-15).  ``rank``: greedy by descending
    score, skipping (not stopping at) segments that do not fit, with the
    reference's strict ``<`` budget test (summarizer/utils/eval.py:102-109).
    """
    nfps = [int(w) for w in np.asarray(nfps).reshape(-1)]
    if method == "knapsack":
        values = (np.asarray(seg_scores, dtype=np.float64) * 1000).astype(np.int64)
        return knapsack_solve(values.tolist(), nfps, int(limit))
    if method == "rank":
        # The reference sorts with np.argsort's default (unstable) quicksort
        # (eval.py:103), so its tie order among equal segment scores is
        # arbitrary; we fix tie order deterministically with a stable sort
        # (ties visited highest-index first), matching the device kernel.
        picks: list[int] = []
        total = 0
        for i in np.argsort(np.asarray(seg_scores), kind="stable")[::-1]:
            if total + nfps[i] < limit:
                picks.append(int(i))
                total += nfps[i]
        return picks
    raise KeyError(f"Unknown method {method}")


def generate_summary(
    scores: np.ndarray,
    cps: np.ndarray,
    n_frames: int,
    nfps,
    positions: np.ndarray,
    proportion: float = 0.15,
    method: str = "knapsack",
) -> np.ndarray:
    """Binary keyshot summary vector of shape ``(sum(nfps),)``.

    Upsample -> per-segment means -> budget ``floor(n_frames * proportion)``
    -> knapsack/rank selection -> concatenated 0/1 runs per segment
    (ref: summarizer/utils/eval.py:74-123).
    """
    frame_scores = upsample(scores, int(n_frames), positions)
    seg_scores = _segment_means(frame_scores, cps)
    limit = int(math.floor(int(n_frames) * proportion))
    picks = set(select_segments(seg_scores, nfps, limit, method))
    runs = [
        np.full(int(nf), 1.0 if i in picks else 0.0, dtype=np.float32)
        for i, nf in enumerate(np.asarray(nfps).reshape(-1))
    ]
    return np.concatenate(runs) if runs else np.zeros(0, dtype=np.float32)


def human_leave_one_out(records, metric: str = "spearmanr"):
    """Table 1's "Human, leave-one-out (upper bound)" row, computed directly
    from the annotations (the reference never computes it in code — the row
    exists only in Summarizer.pdf Table 1; protocol per its caption).

    F1 side: each annotator's binary summary plays the machine summary
    against the REST of the annotators (``evaluate_summary`` semantics);
    a video's (avg, max) F1 is the mean over annotators of that user's
    (avg, max) vs the rest.  Corr side: each annotator's per-frame scores
    vs the remaining annotators' (``evaluate_scores`` semantics).  A video
    with <2 annotators on a side contributes nothing to that side —
    single-annotator LOL yields NaN, the paper's "—".

    Returns (corr, avg_f1, max_f1) averaged over videos.
    """
    af, mf, cc = [], [], []
    for r in records:
        us = r.user_summary
        if us is not None and us.shape[0] >= 2:
            a_list, m_list = [], []
            for u in range(us.shape[0]):
                rest = np.delete(np.asarray(us), u, axis=0)
                a, m = evaluate_summary(np.asarray(us)[u], rest)
                a_list.append(a)
                m_list.append(m)
            af.append(float(np.mean(a_list)))
            mf.append(float(np.mean(m_list)))
        sc = r.user_scores
        if sc is not None and sc.shape[0] >= 2:
            cs = [
                evaluate_scores(
                    np.asarray(sc)[u], np.delete(np.asarray(sc), u, axis=0), metric
                )
                for u in range(sc.shape[0])
            ]
            cc.append(float(np.mean(cs)))
    nan = float("nan")
    return (
        float(np.mean(cc)) if cc else nan,
        float(np.mean(af)) if af else nan,
        float(np.mean(mf)) if mf else nan,
    )


def evaluate_summary(
    machine_summary: np.ndarray, user_summary: np.ndarray
) -> tuple[float, float]:
    """(avg F1, max F1) of the machine summary against each annotator.

    Binarizes (>0), pads/clips the machine vector to the annotation length,
    and uses the reference's 1e-8-stabilized precision/recall with F=0 only
    when both are exactly zero (ref: summarizer/utils/eval.py:125-166).
    """
    user = (np.asarray(user_summary, dtype=np.float32) > 0).astype(np.float32)
    n_users, n_frames = user.shape
    machine = (np.asarray(machine_summary, dtype=np.float32) > 0).astype(np.float32)
    if len(machine) > n_frames:
        machine = machine[:n_frames]
    elif len(machine) < n_frames:
        machine = np.concatenate([machine, np.zeros(n_frames - len(machine))])

    overlap = user @ machine  # (n_users,)
    precision = overlap / (machine.sum() + 1e-8)
    recall = overlap / (user.sum(axis=1) + 1e-8)
    with np.errstate(invalid="ignore"):
        f1 = np.where(
            (precision == 0) & (recall == 0),
            0.0,
            2 * precision * recall / (precision + recall),
        )
    return float(np.mean(f1)), float(np.max(f1))
