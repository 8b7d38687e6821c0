"""Download the preprocessed datasets, or synthesize fixtures offline."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("Fetch summarizer datasets")
    p.add_argument("--dest", type=str, default="datasets")
    p.add_argument(
        "--synthetic",
        action="store_true",
        help="Generate schema-complete synthetic datasets instead of downloading "
        "(for air-gapped environments)",
    )
    p.add_argument("--videos", type=int, default=50, help="synthetic: videos per dataset")
    args = p.parse_args(argv)

    if args.synthetic:
        import os

        from summarizer_tpu.data.synthetic import write_synthetic_dataset

        for name, n, users in (("summe", 25, 15), ("tvsum", args.videos, 20)):
            path = os.path.join(args.dest, f"summarizer_dataset_{name}_google_pool5.h5")
            write_synthetic_dataset(path, n_videos=n, seed=hash(name) % 2**31, n_users=users, name=name)
            print(f"synthetic -> {path}")
        return

    from summarizer_tpu.data.download import download_datasets

    download_datasets(args.dest)


if __name__ == "__main__":
    main()
