"""Observability: console+file logger, TensorBoard/CSV metric writers.

Mirrors the reference's three channels (summarizer/utils/config.py:152-165,
logistic.py:91-102): a dual-handler logger, TensorBoard scalars/histograms
namespaced ``{dataset}/Fold_{k}/{Train,Test}/...``, and run artifacts in the
log dir.  TensorBoard is optional (CSV always works), so headless test runs
carry no torch dependency.
"""

from __future__ import annotations

import csv
import logging
import os


def make_logger(log_path: str, level=logging.INFO, name: str = "summarizer_tpu"):
    logger = logging.getLogger(name)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s::%(levelname)s: %(message)s", "%H:%M:%S")
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    if log_path:
        os.makedirs(log_path, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_path, "train.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(level)
    logger.propagate = False
    return logger


class MetricsWriter:
    """add_scalar/add_histogram/add_hparams over TensorBoard + CSV."""

    def __init__(self, log_path: str, tensorboard: bool = True):
        self.log_path = log_path
        self._tb = None
        self._csv_path = None
        if log_path:
            os.makedirs(log_path, exist_ok=True)
            self._csv_path = os.path.join(log_path, "metrics.csv")
            with open(self._csv_path, "w", newline="") as f:
                csv.writer(f).writerow(["tag", "step", "value"])
        if tensorboard and log_path:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_path)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        if self._csv_path:
            with open(self._csv_path, "a", newline="") as f:
                csv.writer(f).writerow([tag, step, float(value)])
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_histogram(self, tag: str, values, step: int):
        if self._tb is not None:
            import numpy as np

            self._tb.add_histogram(tag, np.asarray(values), step)

    def add_hparams(self, hparam_dict: dict, metric_dict: dict):
        if self._tb is not None:
            self._tb.add_hparams(hparam_dict, metric_dict)

    def close(self):
        if self._tb is not None:
            self._tb.close()
