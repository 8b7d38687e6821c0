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


def synth_video_v2(
    rng: np.random.RandomState,
    n_steps: int,
    feature_dim: int,
    n_users: int,
    global_w: np.ndarray,
    prof: dict,
):
    """Annotator-calibrated video generator (round-5 fixtures, VERDICT r4
    item 3).

    The legacy generator drew every annotator as the same segment importance
    plus sigma=0.15 frame noise, which made Human-LOO read 0.94-0.97 Avg F1
    where the paper's anchors are 0.538 (TVSum) / 0.311 (SumMe) — the Avg-F1
    column compressed and carried no ordering signal.  This one models the
    two real mechanisms (Otani et al., "Rethinking the Evaluation of Video
    Summaries"; reference eval.py:74-166 semantics):

    - **TVSum-like** (``summary_mode="knapsack"``): every annotator's binary
      summary is derived from their scores by the SAME score-only knapsack
      the machine uses.  Score-only values make score/length density the
      criterion, so with heterogeneous (lognormal) segment lengths every
      knapsack — random or human — concentrates on the same small-segment
      set: Random Avg F1 lands ~0.546 and Human ~0.538 with only the corr
      column separating them, exactly Table 1's TVSum shape.
    - **SumMe-like** (``summary_mode="greedy"``): annotators select segments
      greedily by their OWN importance view under an idiosyncratic budget
      (~15% +/- jitter), the real SumMe's raw-interval protocol.  Overlap is
      then agreement-driven: Random ~0.215, Human ~0.311.

    Per-user scores are ``alpha * shared + (1 - alpha) * own`` segment
    importance plus per-frame noise; ``alpha``/noise set the Human-LOO
    Spearman (0.204 TVSum / 0.329 SumMe).  The shared importance carries the
    dataset-global planted feature signal (strength ``prof["signal"]``) so
    trained scorers separate from Random on corr, as in Table 1.
    """
    n_frames = n_steps * SUBSAMPLE
    picks = (np.arange(n_steps) * SUBSAMPLE).astype(np.int32)

    # Heterogeneous (lognormal) segment lengths in frames: the length
    # spread is what lets the score-only knapsack concentrate on small
    # segments regardless of scores (the TVSum F1 mechanism).
    mean_len = prof["seg_mean_frames"]
    n_segs = max(4, int(round(n_frames / mean_len)))
    raw = np.exp(rng.randn(n_segs) * prof["seg_sigma"])
    lengths = np.maximum(1, np.round(raw / raw.sum() * n_frames)).astype(np.int64)
    # Fix rounding drift so the lengths exactly tile n_frames.
    drift = int(n_frames - lengths.sum())
    order = np.argsort(-lengths)
    i = 0
    while drift != 0:
        j = order[i % n_segs]
        step = 1 if drift > 0 else -1
        if lengths[j] + step >= 1:
            lengths[j] += step
            drift -= step
        i += 1
    ends = np.cumsum(lengths) - 1
    starts = np.concatenate([[0], ends[:-1] + 1])
    cps = np.stack([starts, ends], axis=1).astype(np.int32)
    nfps = lengths.astype(np.int32)
    seg_of_step = np.searchsorted(ends, picks, side="left")

    # Shared importance: planted feature-visible signal + feature-invisible
    # segment noise; features carry the centroids so the mapping is
    # learnable across videos (same contract as the legacy planted path).
    centroids = rng.randn(n_segs, feature_dim).astype(np.float32)
    z = centroids @ global_w
    shared = np.clip(
        0.5 + prof["signal"] * z + rng.randn(n_segs) * prof["shared_noise"],
        0.0, 1.0,
    ).astype(np.float32)
    feats = (
        centroids[seg_of_step] * 0.5
        + rng.randn(n_steps, feature_dim).astype(np.float32) * 0.1
    )

    # Per-user views: alpha-mixed shared + own importance, frame noise.
    alpha = prof["alpha"]
    own = np.clip(
        0.5 + rng.randn(n_users, n_segs) * prof["own_noise"], 0.0, 1.0
    )
    user_seg_imp = (alpha * shared[None, :] + (1 - alpha) * own).astype(np.float32)
    frame_imp = user_seg_imp[:, np.searchsorted(ends, np.arange(n_frames))]
    user_scores = np.clip(
        frame_imp + rng.randn(n_users, n_frames).astype(np.float32)
        * prof["score_noise"],
        0, 1,
    ).astype(np.float32)

    bounds = np.concatenate([[0], np.cumsum(nfps)])
    user_summary = np.zeros((n_users, n_frames), np.float32)
    budget15 = int(np.floor(n_frames * 0.15))
    for u in range(n_users):
        seg_mean = np.add.reduceat(user_scores[u], bounds[:-1]) / nfps
        if prof["summary_mode"] == "knapsack":
            # Same selection op the machine summary uses (eval_np.
            # select_segments semantics): score-only values, frame weights.
            from summarizer_tpu.ops.knapsack import knapsack_solve

            values = (seg_mean * 1000).astype(np.int64)
            keep = knapsack_solve(values.tolist(), nfps.tolist(), budget15)
        else:
            # Raw-interval annotator: greedy by own importance under an
            # idiosyncratic budget, skipping segments that do not fit.
            b = int(n_frames * (prof["user_budget"]
                                + prof["budget_jitter"] * (rng.rand() * 2 - 1)))
            keep, total = [], 0
            for s in np.argsort(-user_seg_imp[u], kind="stable"):
                if total + nfps[s] <= b:
                    keep.append(int(s))
                    total += int(nfps[s])
        for s in keep:
            user_summary[u, bounds[s]: bounds[s + 1]] = 1.0

    # gtscore mirrors the real normalize step: per-frame mean of the user
    # scores, sampled at picks (data/normalize.py; TVSum (anno-1)/4 -> mean).
    mean_frame = user_scores.mean(axis=0)
    gtscore = mean_frame[picks].astype(np.float32)
    gtscore -= gtscore.min()
    gtscore /= gtscore.max() + 1e-8
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


# Calibrated to Summarizer.pdf Table 1's anchor rows (Random lower bound,
# Human-LOO upper bound) by scripts/calibrate_synthetic.py (round-5 grid +
# refinement, 2026-08-21); pinned by tests/test_synthetic_calibration.py.
# Measured anchors at these constants (12-video draws, exact eval oracle):
#   tvsum_v2: Random 0.541/0.764 corr ~0 | Human 0.554/0.787 corr 0.211
#             (Table 1: 0.546/0.743/0.002 | 0.538/0.775/0.204)
#   summe_v2: Random 0.233/0.423 corr ~0 | Human 0.282/0.561 corr 0.292
#             (Table 1: 0.215/0.450/0.003 | 0.311/0.543/0.329)
# The planted-signal share of the shared importance is sized for trained-row
# learnability, not just the eval-side ceiling: the reference's own logistic
# recipe (e30) achieves corr 0.140 tvsum / 0.076 summe on these fixtures
# (Table 1: 0.232 / 0.109 on the real data) while Random stays at ~0 —
# shifting shared-noise variance into the planted projection keeps the
# Random/Human anchors fixed (total shared variance unchanged) but feeds the
# feature->importance mapping models actually train on.
PROFILES: dict[str, dict] = {
    "tvsum_v2": dict(summary_mode="knapsack", alpha=0.45, own_noise=0.4,
                     score_noise=0.2, shared_noise=0.12, signal=0.35,
                     seg_mean_frames=120, seg_sigma=0.55,
                     user_budget=0.15, budget_jitter=0.0),
    "summe_v2": dict(summary_mode="greedy", alpha=0.55, own_noise=0.18,
                     score_noise=0.05, shared_noise=0.06, signal=0.10,
                     seg_mean_frames=90, seg_sigma=0.9,
                     user_budget=0.11, budget_jitter=0.05),
}


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
    profile: str | None = None,
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
    if planted_signal > 0 or profile:
        gw = rng.randn(feature_dim).astype(np.float32)
        global_w = gw / np.linalg.norm(gw)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["synthetic"] = True  # provenance flag read by cli/benchmark.py
        if planted_signal > 0:
            f.attrs["planted_signal"] = float(planted_signal)
        if profile:
            f.attrs["profile"] = profile
        for i in range(n_videos):
            n_steps = int(rng.randint(min_steps, max_steps + 1))
            if profile:
                v = synth_video_v2(rng, n_steps, feature_dim, n_users,
                                   global_w=global_w, prof=PROFILES[profile])
            else:
                v = synth_video(rng, n_steps, feature_dim, n_users,
                                global_w=global_w,
                                signal_strength=planted_signal)
            g = f.create_group(f"video_{i + 1}")
            for k, arr in v.items():
                g.create_dataset(k, data=arr)
            g.create_dataset("video_name", data=np.bytes_(f"{name}_{i + 1}"))
    return path
