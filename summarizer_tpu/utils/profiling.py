"""Profiling & step-timing subsystem (new; the reference has none —
SURVEY.md §5 "Tracing/profiling: none").

Two tools:
  - ``trace(log_dir)``: context manager around ``jax.profiler`` producing a
    TensorBoard-loadable device trace (XLA ops, HBM usage, ICI traffic).
  - ``StepTimer``: lightweight wall-clock accounting with p50/p95 summaries,
    used by the engines when ``--profile`` is on.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, name: str = "step"):
        self.name = name
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> dict:
        if not self.times:
            return {"name": self.name, "n": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "name": self.name,
            "n": n,
            "total_s": sum(ts),
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p95_s": ts[min(n - 1, int(0.95 * n))],
        }
