"""Command-line entry points (parity with the reference CLIs):

  python -m summarizer_tpu.cli.train        <- summarizer/main.py
  python -m summarizer_tpu.cli.benchmark    <- summarizer/benchmark.py
  python -m summarizer_tpu.cli.create_split <- summarizer/create_split.py
  python -m summarizer_tpu.cli.summary      <- summarizer/summary.py
  python -m summarizer_tpu.cli.download     <- summarizer/datasets/download_datasets.py
  python -m summarizer_tpu.cli.normalize    <- summarizer/datasets/normalize_datasets.py
"""
