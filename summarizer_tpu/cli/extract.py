"""Feature-extraction CLI: raw videos/frames -> summarizer h5 on the TPU.

Replaces the reference's offline precompute dependency (the published h5s
were built with GoogLeNet pool5 of every 15th frame, summarizer/datasets/
README.md:46; no extraction code ships with the reference).  ImageNet
weights come from scripts/export_googlenet_weights.py (torchvision ->
npz, run once on any online machine):

    python -m summarizer_tpu.cli.extract \
        -v videos/ -o datasets/summarizer_dataset_mine_google_pool5.h5 \
        --weights googlenet_imagenet.npz [--kts]

Without --weights the tower runs with random init — shape-correct but
feature values are noise; a loud warning is printed.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser("summarizer_tpu : Feature extraction")
    p.add_argument("-v", "--videos", required=True,
                   help="Directory of videos (or frame dirs), or one video file")
    p.add_argument("-o", "--output", required=True, help="Output h5 path")
    p.add_argument("--weights", default=None,
                   help="GoogLeNet ImageNet npz (scripts/export_googlenet_weights.py)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--kts", action="store_true",
                   help="KTS change points on device instead of uniform 2 s segments")
    p.add_argument("--max-segments", type=int, default=None)
    args = p.parse_args(argv)

    import jax

    from summarizer_tpu.features.extract import extract_features, write_features_h5
    from summarizer_tpu.features.googlenet import googlenet_init, load_npz

    if args.weights:
        params = load_npz(args.weights)
        print(f"loaded GoogLeNet weights from {args.weights}")
    else:
        print(
            "WARNING: no --weights given; using RANDOM GoogLeNet weights. "
            "Features will be noise — export real ones with "
            "scripts/export_googlenet_weights.py.",
            file=sys.stderr,
        )
        params = googlenet_init(jax.random.PRNGKey(0))

    src = args.videos
    if os.path.isdir(src):
        entries = sorted(
            os.path.join(src, e) for e in os.listdir(src)
            if not e.startswith(".")
        )
    else:
        entries = [src]

    videos = {}
    for i, path in enumerate(entries, 1):
        name = os.path.splitext(os.path.basename(path))[0]
        print(f"[{i}/{len(entries)}] {name} ...", flush=True)
        videos[f"video_{i}"] = dict(
            extract_features(
                params, path, batch=args.batch, fps=args.fps,
                segmentation="kts" if args.kts else "uniform",
                max_segments=args.max_segments,
            ),
            video_name=name,
        )
    write_features_h5(args.output, videos)
    print(f"wrote {args.output} ({len(videos)} videos)")


if __name__ == "__main__":
    main()
