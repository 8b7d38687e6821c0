"""ctypes loader for the first-party native kernels (knapsack DP, rankdata).

Builds ``libsummarizer_native.so`` from the in-tree C++ on first use (g++ is
part of the toolchain; there is no pip dependency) and caches it next to the
sources.  Every consumer must tolerate ``load_native() -> None`` and fall back
to the pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "knapsack.cpp")
_LIB = os.path.join(_DIR, "libsummarizer_native.so")
_lock = threading.Lock()


class NativeOps:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.knapsack_dp.restype = ctypes.c_int64
        lib.knapsack_dp.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rankdata_average.restype = None
        lib.rankdata_average.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]

    def knapsack(self, values, weights, capacity: int) -> list[int]:
        v = np.ascontiguousarray(values, dtype=np.int64)
        w = np.ascontiguousarray(weights, dtype=np.int64)
        n = len(v)
        out = np.zeros(max(n, 1), dtype=np.int64)
        cnt = self._lib.knapsack_dp(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            int(capacity),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out[:cnt].tolist()

    def rankdata(self, x) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float32)
        order = np.argsort(x, kind="stable").astype(np.int64)
        out = np.zeros(len(x), dtype=np.float64)
        self._lib.rankdata_average(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(x),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out


_cached: NativeOps | None = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _LIB,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0 and os.path.exists(_LIB)
    except Exception:
        return False


def load_native() -> NativeOps | None:
    """Return the native ops table, building the .so on first call."""
    global _cached, _failed
    if _cached is not None or _failed:
        return _cached
    with _lock:
        if _cached is not None or _failed:
            return _cached
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            _cached = NativeOps(ctypes.CDLL(_LIB))
        except OSError:
            _failed = True
    return _cached
