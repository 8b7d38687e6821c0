"""Random CV split generator (ref: summarizer/create_split.py:44-76)."""

from __future__ import annotations

import argparse
import math
import os

import h5py

from summarizer_tpu.data.splits import make_random_splits, write_splits


def main(argv=None):
    p = argparse.ArgumentParser("Create CV splits as JSON")
    p.add_argument("-d", "--dataset", type=str, required=True, help="path to h5 dataset")
    p.add_argument("--save-dir", type=str, default="splits")
    p.add_argument("--save-name", type=str, default="new_split")
    p.add_argument("--num-splits", type=int, default=5)
    p.add_argument("--train-percent", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--aug",
        nargs="*",
        default=None,
        metavar="OTHER_H5",
        help="Build augmented cross-dataset splits: train on ALL videos of "
        "these other h5 files plus train-percent of --dataset; test on the "
        "rest of --dataset (keys become '<dataset>/<key>')",
    )
    args = p.parse_args(argv)

    with h5py.File(args.dataset, "r") as f:
        keys = list(f.keys())
    n_train = int(math.ceil(len(keys) * args.train_percent))

    if args.aug is not None:
        from summarizer_tpu.data.hdf5 import dataset_short_name
        from summarizer_tpu.data.splits import make_augmented_splits

        target = dataset_short_name(args.dataset)
        target_keys = [f"{target}/{k}" for k in keys]
        other_keys = []
        for other in args.aug:
            prefix = dataset_short_name(other)
            with h5py.File(other, "r") as f:
                other_keys += [f"{prefix}/{k}" for k in f.keys()]
        print(
            f"Augmented split: {len(other_keys)} cross-dataset train videos + "
            f"{n_train}/{len(keys)} of {target}"
        )
        splits = make_augmented_splits(
            target_keys, other_keys, args.num_splits, args.train_percent, args.seed
        )
    else:
        print(
            f"Splitting {len(keys)} videos x{args.num_splits}: "
            f"{n_train} train / {len(keys) - n_train} test"
        )
        splits = make_random_splits(keys, args.num_splits, args.train_percent, args.seed)
    out = os.path.join(args.save_dir, f"{args.save_name}.json")
    write_splits(splits, out)
    print(f"Splits saved to {out}")


if __name__ == "__main__":
    main()
