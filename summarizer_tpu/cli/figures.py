"""Score-distribution figures from a predictions h5 (script replacement for
the reference's datasets/figures.ipynb: per-video machine vs user score
curves and the selected-keyshot overlay)."""

from __future__ import annotations

import argparse
import os

import h5py
import numpy as np


def plot_video(pred_path: str, dataset_key: str, video: str, out_dir: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with h5py.File(pred_path, "r") as f:
        g = f[dataset_key][video]
        machine_scores = g["machine_scores"][...]
        machine_summary = g["machine_summary"][...]
        user_summary = g["user_summary"][...]

    fig, ax = plt.subplots(2, 1, figsize=(12, 6), sharex=True)
    ax[0].plot(machine_scores, lw=0.8, label="machine scores")
    ax[0].fill_between(
        np.arange(len(machine_summary)),
        0,
        machine_summary * machine_scores.max(),
        alpha=0.25,
        label="machine summary",
    )
    ax[0].legend(loc="upper right")
    ax[0].set_title(f"{video}: machine scores + selected keyshots")
    ax[1].imshow(
        user_summary, aspect="auto", interpolation="nearest", cmap="Greys"
    )
    ax[1].set_title(f"user summaries ({user_summary.shape[0]} annotators)")
    ax[1].set_xlabel("frame")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"fig_{video}.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def main(argv=None):
    p = argparse.ArgumentParser("Render figures from a predictions h5")
    p.add_argument("-p", "--path", required=True, help="predictions h5")
    p.add_argument("-d", "--dataset", required=True, help="dataset group key")
    p.add_argument("-v", "--video", default=None, help="one video (default: all)")
    p.add_argument("-o", "--out-dir", default="figures")
    args = p.parse_args(argv)

    with h5py.File(args.path, "r") as f:
        videos = [args.video] if args.video else list(f[args.dataset].keys())
    for v in videos:
        out = plot_video(args.path, args.dataset, v, args.out_dir)
        print(out)


if __name__ == "__main__":
    main()
