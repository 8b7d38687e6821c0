"""0/1-knapsack segment selection.

The reference delegates to OR-Tools' C++ ``KnapsackSolver`` in
``KNAPSACK_DYNAMIC_PROGRAMMING_SOLVER`` mode (summarizer/utils/knapsack.py:5-23).
Here the solver is first-party:

  - a C++ DP (``native/knapsack.cpp``) loaded through ctypes — the default,
  - a vectorized-numpy DP with identical results as a dependency-free fallback,
  - and a batched ``lax.scan`` DP in ops/eval_jax.py for on-device evaluation.

All three produce the optimal value; on value ties the kept set is the one
that excludes the *latest-indexed* undecidable item (an item is taken during
traceback only when taking it strictly improved the DP row), which matches
the classic table-traceback DP the reference's solver implements.
"""

from __future__ import annotations

import numpy as np

from summarizer_tpu.native import load_native

_native = None
_native_checked = False


def _get_native():
    global _native, _native_checked
    if not _native_checked:
        _native = load_native()
        _native_checked = True
    return _native


def knapsack_solve_py(values, weights, capacity: int) -> list[int]:
    """Exact 0/1-knapsack via a numpy-vectorized DP over the capacity axis.

    ``values``/``weights`` are non-negative ints; returns ascending indices of
    the selected items (ref behavior: summarizer/utils/knapsack.py:17-23).
    """
    values = np.asarray(values, dtype=np.int64).reshape(-1)
    weights = np.asarray(weights, dtype=np.int64).reshape(-1)
    n = len(values)
    capacity = int(capacity)
    if n == 0 or capacity <= 0:
        return []

    dp = np.zeros(capacity + 1, dtype=np.int64)
    keep = np.zeros((n, capacity + 1), dtype=bool)
    for i in range(n):
        w, v = int(weights[i]), int(values[i])
        if w > capacity:
            continue
        cand = dp[: capacity + 1 - w] + v
        better = cand > dp[w:]
        dp[w:] = np.where(better, cand, dp[w:])
        keep[i, w:] = better

    picks = []
    c = capacity
    for i in range(n - 1, -1, -1):
        if keep[i, c]:
            picks.append(i)
            c -= int(weights[i])
    picks.reverse()
    return picks


def knapsack_solve(values, weights, capacity: int) -> list[int]:
    """Solve 0/1 knapsack, preferring the native C++ DP when built."""
    nat = _get_native()
    if nat is not None:
        return nat.knapsack(values, weights, capacity)
    return knapsack_solve_py(values, weights, capacity)
