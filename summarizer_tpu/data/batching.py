"""Padded, masked device batches from variable-length video records.

The single biggest architectural divergence from the reference: XLA traces a
program once per shape, so per-video dynamic shapes (summarizer/models/
logistic.py:68-70) become one padded ``(N, T_max, D)`` tensor with masks.
Lengths are rounded up to the TPU lane quantum (128) to keep MXU tiling
aligned; shuffling is an index permutation on device, not a host re-read.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from summarizer_tpu.data.hdf5 import VideoRecord
from summarizer_tpu.ops.eval_jax import EvalBatch


def round_up(x: int, m: int) -> int:
    return ((max(int(x), 1) + m - 1) // m) * m


class TrainPack(NamedTuple):
    """All train-fold tensors, padded: feed once, scan every epoch on-device."""

    features: np.ndarray  # (N, T, D) f32
    targets: np.ndarray  # (N, T) f32 per-video min-max normalized gtscore
    mask: np.ndarray  # (N, T) f32 validity
    lengths: np.ndarray  # (N,) int32


def pack_train(records: list[VideoRecord], t_max: int | None = None, quantum: int = 8) -> TrainPack:
    if t_max is None:
        t_max = round_up(max(r.n_steps for r in records), quantum)
    n, d = len(records), records[0].features.shape[1]
    feats = np.zeros((n, t_max, d), np.float32)
    targs = np.zeros((n, t_max), np.float32)
    mask = np.zeros((n, t_max), np.float32)
    lens = np.zeros(n, np.int32)
    for i, r in enumerate(records):
        t = r.n_steps
        if t > t_max:
            raise ValueError(f"video {r.key} has {t} steps > t_max={t_max}")
        feats[i, :t] = r.features[:t]
        targs[i, :t] = r.normalized_gtscore[:t]
        mask[i, :t] = 1.0
        lens[i] = t
    return TrainPack(feats, targs, mask, lens)


def eval_static_dims(records: list[VideoRecord], proportion: float = 0.15, quantum: int = 8):
    """Static paddings for the eval program: (S, G, U, F, max_capacity)."""
    s = round_up(max(r.n_steps for r in records), quantum)
    g = round_up(max(len(r.n_frame_per_seg) for r in records), quantum)
    # U covers BOTH annotation kinds: real SumMe has 15-18 /user_summary
    # annotators but a single /user_scores pseudo-user (datasets/
    # README.md:54-74) — their per-video counts are independent.
    u = max(
        max(
            (r.user_scores.shape[0] if r.user_scores is not None else 1),
            (r.user_summary.shape[0] if r.user_summary is not None else 1),
        )
        for r in records
    )
    f = round_up(max(r.n_frames for r in records), 128)
    cap = int(max(np.floor(r.n_frames * proportion) for r in records))
    return s, g, u, f, cap


def pack_eval(
    records: list[VideoRecord], s: int, g: int, u: int, f: int
) -> tuple[EvalBatch, np.ndarray]:
    """Pack records into an ``EvalBatch`` plus padded features (B, S, D)."""
    b, d = len(records), records[0].features.shape[1]
    feats = np.zeros((b, s, d), np.float32)
    positions = np.zeros((b, s), np.int32)
    n_steps = np.zeros(b, np.int32)
    n_frames = np.zeros(b, np.int32)
    cps = np.zeros((b, g, 2), np.int32)
    nfps = np.zeros((b, g), np.int32)
    n_segs = np.zeros(b, np.int32)
    user_scores = np.zeros((b, u, f), np.float32)
    user_summary = np.zeros((b, u, f), np.float32)
    n_users = np.zeros(b, np.int32)
    n_summary_users = np.zeros(b, np.int32)

    for i, r in enumerate(records):
        t = r.n_steps
        feats[i, :t] = r.features[:t]
        positions[i, :t] = r.picks[:t]
        n_steps[i] = t
        n_frames[i] = r.n_frames
        ns = len(r.n_frame_per_seg)
        cps[i, :ns] = r.change_points[:ns]
        nfps[i, :ns] = r.n_frame_per_seg[:ns]
        n_segs[i] = ns
        if r.user_scores is None:
            raise ValueError(
                f"No /user_scores in video {r.key} for score evaluation, "
                "make sure you have up-to-date .h5 dataset files."
            )  # message parity with models/__init__.py:73-75
        if r.user_summary is None:
            raise ValueError(
                f"No /change_points in video {r.key} for summary evaluation, "
                "make sure you have up-to-date .h5 dataset files."
            )
        nu = r.user_scores.shape[0]
        nf = min(r.n_frames, f)
        user_scores[i, :nu, :nf] = r.user_scores[:, :nf]
        user_summary[i, : r.user_summary.shape[0], :nf] = r.user_summary[:, :nf]
        n_users[i] = nu
        n_summary_users[i] = r.user_summary.shape[0]

    # Average-tie ranks of the (run-constant) annotator scores, computed once
    # here so the per-eval device program only ranks the machine side
    # (ops/eval_jax.py::eval_scores_video).  scipy semantics == the device
    # rankdata_masked (both pinned to scipy in tests/test_ranking.py).
    from scipy.stats import rankdata

    user_ranks = np.zeros((b, u, f), np.float32)
    for i, r in enumerate(records):
        nf = min(r.n_frames, f)
        for j in range(int(n_users[i])):
            user_ranks[i, j, :nf] = rankdata(user_scores[i, j, :nf])

    batch = EvalBatch(
        positions=positions,
        n_steps=n_steps,
        n_frames=n_frames,
        cps=cps,
        nfps=nfps,
        n_segs=n_segs,
        user_scores=user_scores,
        user_summary=user_summary,
        n_users=n_users,
        n_summary_users=n_summary_users,
        user_ranks=user_ranks,
    )
    return batch, feats
