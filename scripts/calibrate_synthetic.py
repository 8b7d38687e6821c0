"""Calibrate the v2 synthetic-annotator profiles to Table 1's anchor rows.

Targets (Summarizer.pdf Table 1, BASELINE.md:28-29):

                 Random avg/max F1   Random corr   Human avg/max F1   Human corr
    TVSum-like       0.546 / 0.743        0.002       0.538 / 0.775        0.204
    SumMe-like       0.215 / 0.450        0.003       0.311 / 0.543        0.329

For a candidate profile this script generates videos with
data/synthetic.synth_video_v2 and measures both anchor rows with the exact
eval oracle (ops/eval_np): Random = knapsack summary from uniform-random
step scores (mean of N_RANDOM_SEEDS draws), Human = human_leave_one_out.
Run with --grid to search around the current PROFILES constants, or with no
args to report the current constants' anchors (what the pin test asserts).

Usage:
    JAX_PLATFORMS=cpu python scripts/calibrate_synthetic.py [--grid] [--videos N]
"""

import argparse
import itertools
import os
import sys
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summarizer_tpu.data.synthetic import PROFILES, synth_video_v2
from summarizer_tpu.ops import eval_np

TARGETS = {
    "tvsum_v2": dict(r_avg=0.546, r_max=0.743, h_avg=0.538, h_max=0.775,
                     h_corr=0.204, users=20, steps=(100, 650)),
    "summe_v2": dict(r_avg=0.215, r_max=0.450, h_avg=0.311, h_max=0.543,
                     h_corr=0.329, users=15, steps=(100, 650)),
}

N_RANDOM_SEEDS = 3


def gen_videos(profile: dict, n_videos: int, n_users: int, steps, seed=0):
    rng = np.random.RandomState(seed)
    gw = rng.randn(1024).astype(np.float32)
    gw /= np.linalg.norm(gw)
    vids = []
    for _ in range(n_videos):
        n_steps = int(rng.randint(steps[0], steps[1] + 1))
        v = synth_video_v2(rng, n_steps, 1024, n_users, gw, profile)
        v["_global_w"] = gw
        vids.append(v)
    return vids


def measure(vids, rng_seed=0):
    """(random_avg_f1, random_max_f1, random_corr, human_corr, human_avg,
    human_max) over the video list."""
    rng = np.random.RandomState(rng_seed + 1000)
    r_avg, r_max, r_corr = [], [], []
    for v in vids:
        aa, mm, cc = [], [], []
        for _ in range(N_RANDOM_SEEDS):
            scores = rng.rand(v["n_steps"]).astype(np.float32)
            summ = eval_np.generate_summary(
                scores, v["change_points"], v["n_frames"],
                v["n_frame_per_seg"], v["picks"])
            a, m = eval_np.evaluate_summary(summ, v["user_summary"])
            frame_scores = eval_np.generate_scores(
                scores, v["n_frames"], v["picks"])
            cc.append(eval_np.evaluate_scores(frame_scores, v["user_scores"]))
            aa.append(a)
            mm.append(m)
        r_avg.append(np.mean(aa))
        r_max.append(np.mean(mm))
        r_corr.append(np.mean(cc))
    recs = [SimpleNamespace(user_summary=v["user_summary"],
                            user_scores=v["user_scores"]) for v in vids]
    h_corr, h_avg, h_max = eval_np.human_leave_one_out(recs)
    return (float(np.mean(r_avg)), float(np.mean(r_max)),
            float(np.mean(r_corr)), h_corr, h_avg, h_max)


def oracle_corrs(vids):
    """Two upper bounds for the corr column on this fixture:

    - ``full``: machine scores = the true shared segment importance
      (includes the feature-INvisible component) — no scorer can beat this;
    - ``planted``: machine scores = the feature-visible planted projection
      only — the ceiling for models that learn features -> importance,
      i.e. where trained families should land (Table 1 TVSum ~0.23,
      SumMe ~0.11)."""
    full, planted = [], []
    for v in vids:
        fs_full = eval_np.generate_scores(
            v["gtscore"], v["n_frames"], v["picks"])
        full.append(eval_np.evaluate_scores(fs_full, v["user_scores"]))
        z = v["features"] @ v["_global_w"]
        fs_pl = eval_np.generate_scores(z, v["n_frames"], v["picks"])
        planted.append(eval_np.evaluate_scores(fs_pl, v["user_scores"]))
    return float(np.mean(full)), float(np.mean(planted))


def report(name, prof, n_videos):
    t = TARGETS[name]
    vids = gen_videos(prof, n_videos, t["users"], t["steps"])
    ra, rm, rc, hc, ha, hm = measure(vids)
    err = (abs(ra - t["r_avg"]) + abs(rm - t["r_max"])
           + abs(ha - t["h_avg"]) + abs(hm - t["h_max"])
           + abs(hc - t["h_corr"]))
    print(f"{name}: Random {ra:.3f}/{rm:.3f} corr {rc:+.3f} "
          f"(target {t['r_avg']:.3f}/{t['r_max']:.3f})  "
          f"Human {ha:.3f}/{hm:.3f} corr {hc:.3f} "
          f"(target {t['h_avg']:.3f}/{t['h_max']:.3f} corr {t['h_corr']:.3f})"
          f"  L1err {err:.3f}")
    oc_full, oc_planted = oracle_corrs(vids)
    print(f"{name}: oracle corr full {oc_full:.3f} / planted-only "
          f"{oc_planted:.3f} (trained families should land at or below the "
          "planted ceiling)")
    return err


def grid(name, n_videos):
    """Coordinate search around the committed constants."""
    t = TARGETS[name]
    base = dict(PROFILES[name])
    if base["summary_mode"] == "knapsack":
        # TVSum: Random ~0.546 slightly ABOVE Human 0.538 requires the
        # users' segment-importance variance to exceed a random scorer's
        # segment-level variance (humans deviate more from the canonical
        # density packing than near-constant random segment means do).
        space = {
            "alpha": [0.3, 0.45],
            "own_noise": [0.2, 0.35, 0.5],
            "shared_noise": [0.15, 0.3],
            "score_noise": [0.25, 0.4],
            "seg_sigma": [0.5, 1.0],
            "seg_mean_frames": [75, 120],
        }
    else:
        space = {
            "alpha": [0.45, 0.55, 0.65],
            "score_noise": [0.08, 0.12, 0.18],
            "seg_sigma": [0.6, 0.9],
            "seg_mean_frames": [90, 110, 140],
            "user_budget": [0.11, 0.13, 0.15],
        }
    best, best_err = base, float("inf")
    keys = sorted(space)
    for combo in itertools.product(*(space[k] for k in keys)):
        prof = dict(base)
        prof.update(dict(zip(keys, combo)))
        vids = gen_videos(prof, n_videos, t["users"], t["steps"])
        ra, rm, rc, hc, ha, hm = measure(vids)
        err = (abs(ra - t["r_avg"]) + abs(rm - t["r_max"])
               + abs(ha - t["h_avg"]) + abs(hm - t["h_max"])
               + abs(hc - t["h_corr"]))
        mark = ""
        if err < best_err:
            best, best_err = prof, err
            mark = "  <-- best"
        print(f"{dict(zip(keys, combo))} -> R {ra:.3f}/{rm:.3f} "
              f"H {ha:.3f}/{hm:.3f} c {hc:.3f} err {err:.3f}{mark}",
              flush=True)
    print(f"\nBEST {name}: {best}  err {best_err:.3f}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", action="store_true")
    ap.add_argument("--videos", type=int, default=12)
    ap.add_argument("--profiles", default="tvsum_v2,summe_v2")
    args = ap.parse_args()
    for name in args.profiles.split(","):
        if args.grid:
            grid(name, args.videos)
        else:
            report(name, PROFILES[name], args.videos)


if __name__ == "__main__":
    main()
