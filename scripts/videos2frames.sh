#!/usr/bin/env bash
# Dump every video's frames as frames/<name>/NNNNNN.jpg via ffmpeg
# (host-side, offline; same contract as the reference's
# datasets/videos2frames.sh — 1-based %06d.jpg consumed by the summary
# exporter, summarizer_tpu/cli/summary.py).
set -euo pipefail
src_dir="${1:-videos}"
dst_dir="${2:-frames}"
for f in "$src_dir"/*.mp4; do
  name="$(basename "${f%.*}")"
  mkdir -p "$dst_dir/$name"
  ffmpeg -hide_banner -loglevel error -i "$f" -f image2 "$dst_dir/$name/%06d.jpg"
  echo "$name done"
done
