"""Executable metric-validation study (replaces the reference's
datasets/correlation.ipynb findings with a reproducible script).

Reproduces the "Rethinking the Evaluation of Video Summaries" sanity checks
the reference based its protocol on (SURVEY.md §4.4):
  1. random scores => Spearman corr ~ 0 against user_scores,
  2. human leave-one-out => a positive upper-bound corr
     (~0.26 TVSum / ~0.33 SumMe on the real datasets),
  3. random scores => the dataset's baseline F1 after knapsack assembly.

Run on any schema-complete h5 (real or synthetic):
  python -m summarizer_tpu.cli.validate_metrics -d datasets/summarizer_dataset_tvsum_google_pool5.h5
"""

from __future__ import annotations

import argparse

import numpy as np

from summarizer_tpu.data.hdf5 import SummarizerDataset
from summarizer_tpu.ops import eval_np


def validate(path: str, proportion: float = 0.15, seed: int = 0):
    ds = SummarizerDataset(path)
    rng = np.random.RandomState(seed)

    rand_corrs, loo_corrs, rand_af1, rand_mf1 = [], [], [], []
    for key in ds.keys():
        r = ds[key]
        # 1. random machine scores
        probs = rng.rand(r.n_steps).astype(np.float32)
        ms = eval_np.generate_scores(probs, r.n_frames, r.picks)
        rand_corrs.append(eval_np.evaluate_scores(ms, r.user_scores))
        summ = eval_np.generate_summary(
            probs, r.change_points, r.n_frames, r.n_frame_per_seg, r.picks, proportion
        )
        a, m = eval_np.evaluate_summary(summ, r.user_summary)
        rand_af1.append(a)
        rand_mf1.append(m)

        # 2. human leave-one-out: each annotator scored against the rest
        n_users = r.user_scores.shape[0]
        if n_users > 1:
            for u in range(n_users):
                rest = np.delete(r.user_scores, u, axis=0)
                loo_corrs.append(
                    eval_np.evaluate_scores(r.user_scores[u], rest)
                )

    report = {
        "random_corr": float(np.nanmean(rand_corrs)),
        "human_loo_corr": float(np.nanmean(loo_corrs)) if loo_corrs else None,
        "random_avg_f1": float(np.mean(rand_af1)),
        "random_max_f1": float(np.mean(rand_mf1)),
    }
    return report


def main(argv=None):
    p = argparse.ArgumentParser("Metric validation study")
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument("-p", "--proportion", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    report = validate(args.dataset, args.proportion, args.seed)
    print(f"Random scores  : corr {report['random_corr']: .4f}  "
          f"avg F1 {report['random_avg_f1']:.4f}  max F1 {report['random_max_f1']:.4f}")
    if report["human_loo_corr"] is not None:
        print(f"Human (LOO)    : corr {report['human_loo_corr']: .4f}")
    print("Expectation: random corr ~ 0; human leave-one-out corr clearly > 0 "
          "(~0.26 TVSum / ~0.33 SumMe on the real datasets).")
    return report


if __name__ == "__main__":
    main()
