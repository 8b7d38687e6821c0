#!/bin/bash
# Remaining GAN benchmark rows (after the 20->10 video-group resize), run
# in sequence so exactly one child owns the TPU at a time:
#   1. SumGAN on summe        (the config the 20-group OOM blocked)
#   2. SumGAN_sup on both
#   3. SumGAN-att on both
# SumGAN/tvsum is NOT re-run: its row is already durable in
# logs/benchmark_rows.jsonl and its fold states are complete.
set -u
cd "$(dirname "$0")/.."

python -m summarizer_tpu.cli.benchmark --models SumGAN -s splits/summe_splits.json
python -m summarizer_tpu.cli.benchmark --models SumGAN_sup \
  -s splits/tvsum_splits.json,splits/summe_splits.json
python -m summarizer_tpu.cli.benchmark --models SumGAN-att
