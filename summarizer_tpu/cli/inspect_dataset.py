"""Dataset schema/statistics explorer (script replacement for the
reference's datasets/dataset.ipynb exploration notebook)."""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def inspect(path: str, video: str | None = None):
    with h5py.File(path, "r") as f:
        keys = list(f.keys())
        print(f"{path}: {len(keys)} videos")
        steps, frames, segs, users = [], [], [], []
        for k in keys:
            d = f[k]
            steps.append(int(np.asarray(d["n_steps"][()]).reshape(-1)[0]) if "n_steps" in d else d["features"].shape[0])
            frames.append(int(np.asarray(d["n_frames"][()]).reshape(-1)[0]))
            segs.append(d["change_points"].shape[0])
            users.append(d["user_summary"].shape[0] if "user_summary" in d else 0)
        for name, v in (("n_steps", steps), ("n_frames", frames), ("segments", segs), ("annotators", users)):
            v = np.asarray(v)
            print(f"  {name:10s} min {v.min():7d}  median {int(np.median(v)):7d}  max {v.max():7d}")
        show = [video] if video else keys[:1]
        for k in show:
            d = f[k]
            print(f"\n[{k}] fields:")
            for field in d:
                obj = d[field]
                shape = obj.shape if hasattr(obj, "shape") else "scalar"
                print(f"  /{field:18s} {shape} {obj.dtype if hasattr(obj, 'dtype') else ''}")


def main(argv=None):
    p = argparse.ArgumentParser("Inspect a summarizer dataset h5")
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument("-v", "--video", default=None)
    args = p.parse_args(argv)
    inspect(args.dataset, args.video)


if __name__ == "__main__":
    main()
