"""Synthetic dataset fixtures in the exact ``summarizer_dataset_*.h5`` schema.

Used by the test-suite and the benchmark harness when the real SumMe/TVSum
HDF5 files are absent (they must be fetched from Google Drive,
summarizer/datasets/download_datasets.py:11-24, which needs network access).
Videos get a latent "event" structure so that learnable signal exists: frame
features are drawn around per-segment centroids and gtscore correlates with a
latent importance that annotators observe with noise.
"""

from __future__ import annotations

import os

import h5py
import numpy as np

SUBSAMPLE = 15  # every 15th frame, as the real datasets (datasets/README.md:46)


def synth_video(rng: np.random.RandomState, n_steps: int, feature_dim: int = 1024, n_users: int = 5,
                global_w: np.ndarray | None = None, signal_strength: float = 0.25):
    n_frames = n_steps * SUBSAMPLE
    picks = (np.arange(n_steps) * SUBSAMPLE).astype(np.int32)

    # Latent segments (like KTS change points): 5-20 per video.
    n_segs = int(rng.randint(5, min(20, max(6, n_steps // 8)) + 1))
    cuts = np.sort(rng.choice(np.arange(1, n_frames), size=n_segs - 1, replace=False))
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts - 1, [n_frames - 1]])
    cps = np.stack([starts, ends], axis=1).astype(np.int32)
    nfps = (ends - starts + 1).astype(np.int32)

    # Latent per-segment importance; features carry it linearly so even a
    # logistic scorer can learn it.
    seg_of_step = np.searchsorted(ends, picks, side="left")
    if global_w is None:
        # Legacy fixture: importance is random per segment and the
        # within-segment modulation uses a per-video projection — there is NO
        # cross-video learnable mapping, so held-out corr ~ 0 for every model
        # (the round-2 LOL column validated scale only).  RNG draw order is
        # kept byte-identical for the summe/tvsum fixtures whose metrics are
        # pinned in parity logs.
        seg_importance = rng.rand(n_segs).astype(np.float32)
        centroids = rng.randn(n_segs, feature_dim).astype(np.float32)
        feats = centroids[seg_of_step] * 0.5 + rng.randn(n_steps, feature_dim).astype(np.float32) * 0.1
        w = rng.randn(feature_dim).astype(np.float32) / np.sqrt(feature_dim)
    else:
        # Planted recoverable signal (VERDICT r2 item 7): segment importance
        # is a monotone function of the DATASET-GLOBAL projection of the
        # segment centroid, which the frame features carry (feats =
        # 0.5*centroid + noise).  A linear scorer can therefore learn a
        # mapping that generalizes to held-out videos; Random stays at ~0.
        centroids = rng.randn(n_segs, feature_dim).astype(np.float32)
        z = centroids @ global_w  # ~N(0,1) per segment (global_w is unit-norm)
        seg_importance = np.clip(
            0.5 + signal_strength * z
            + rng.randn(n_segs).astype(np.float32) * 0.08,
            0.0, 1.0,
        ).astype(np.float32)
        feats = centroids[seg_of_step] * 0.5 + rng.randn(n_steps, feature_dim).astype(np.float32) * 0.1
        w = global_w.astype(np.float32)
    signal = feats @ w
    gtscore = (
        seg_importance[seg_of_step]
        + 0.5 * (signal - signal.mean()) / (signal.std() + 1e-6) * seg_importance.std()
    ).astype(np.float32)
    gtscore -= gtscore.min()
    gtscore /= gtscore.max() + 1e-8

    # Annotator scores: noisy views of the frame-level importance.
    frame_imp = np.repeat(seg_importance, nfps)[:n_frames]
    user_scores = np.clip(
        frame_imp[None, :] + rng.randn(n_users, n_frames).astype(np.float32) * 0.15, 0, 1
    ).astype(np.float32)

    # Annotator summaries: each keeps their top ~15% segments by mean score.
    user_summary = np.zeros((n_users, n_frames), np.float32)
    budget = int(np.floor(n_frames * 0.15))
    bounds = np.concatenate([[0], np.cumsum(nfps)])
    for uidx in range(n_users):
        seg_mean = np.array(
            [user_scores[uidx, bounds[s] : bounds[s + 1]].mean() for s in range(n_segs)]
        )
        total = 0
        for s in np.argsort(-seg_mean):
            if total + nfps[s] <= budget:
                user_summary[uidx, bounds[s] : bounds[s + 1]] = 1.0
                total += nfps[s]

    gtsummary = (gtscore > np.quantile(gtscore, 0.85)).astype(np.float32)
    return dict(
        features=feats,
        gtscore=gtscore,
        gtsummary=gtsummary,
        user_summary=user_summary,
        user_scores=user_scores,
        change_points=cps,
        n_frame_per_seg=nfps,
        n_frames=n_frames,
        n_steps=n_steps,
        picks=picks,
    )


def write_synthetic_dataset(
    path: str,
    n_videos: int = 10,
    seed: int = 0,
    min_steps: int = 60,
    max_steps: int = 240,
    feature_dim: int = 1024,
    n_users: int = 5,
    name: str = "synthetic",
    planted_signal: float = 0.0,
) -> str:
    """Write a schema-complete synthetic h5 at ``path``; returns the path.

    ``planted_signal > 0`` plants a dataset-global linear feature→importance
    mapping (strength = that value) so that trained scorers achieve
    materially positive held-out correlation while Random stays at ~0 —
    making the fixture a quality regression surface, not just a scale one.
    ``0.0`` (default) keeps the legacy per-video generator byte-identical.
    """
    rng = np.random.RandomState(seed)
    global_w = None
    if planted_signal > 0:
        gw = rng.randn(feature_dim).astype(np.float32)
        global_w = gw / np.linalg.norm(gw)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["synthetic"] = True  # provenance flag read by cli/benchmark.py
        if planted_signal > 0:
            f.attrs["planted_signal"] = float(planted_signal)
        for i in range(n_videos):
            n_steps = int(rng.randint(min_steps, max_steps + 1))
            v = synth_video(rng, n_steps, feature_dim, n_users,
                            global_w=global_w, signal_strength=planted_signal)
            g = f.create_group(f"video_{i + 1}")
            for k, arr in v.items():
                g.create_dataset(k, data=arr)
            g.create_dataset("video_name", data=np.bytes_(f"{name}_{i + 1}"))
    return path
