"""Measure the remote-TPU tunnel's link numbers (VERDICT r2 item 9).

Every "tunnel-limited" claim in BENCH_NOTES.md (fused transformer gating,
checkpoint save costs, per-dispatch overhead) should carry a measured
number so the attached-hardware projection is explicit.  This script
measures, on the live device:

  1. dispatch RTT        — median blocking round-trip of a trivial jitted op
  2. device_put MB/s     — host -> device bulk transfer
  3. device_get MB/s     — device -> host bulk transfer (checkpoint fetches)
  4. executable upload   — MB/s, estimated from the compile-wall DELTA of
                           two programs identical except for a baked-in
                           constant (constants are embedded in the
                           executable, so the extra bytes ride the same
                           upload path as the 39 MB fused-CV executables)

Usage:  python scripts/measure_tunnel.py [--mb 64] [--json]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

import numpy as np

import jax
import jax.numpy as jnp


def _t(fn, n=1):
    best = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best.append(time.perf_counter() - t0)
    return best


def measure(mb: int = 64):
    dev = jax.devices()[0]
    out: dict = {"device": str(dev), "payload_mb": mb}

    # 1. dispatch RTT: blocking tiny op, warm executable.
    one = jnp.ones((8, 128), jnp.float32)
    tiny = jax.jit(lambda x: x + 1.0)
    tiny(one).block_until_ready()
    rtts = _t(lambda: tiny(one).block_until_ready(), n=30)
    out["dispatch_rtt_ms_median"] = round(statistics.median(rtts) * 1e3, 3)
    out["dispatch_rtt_ms_p90"] = round(sorted(rtts)[int(0.9 * len(rtts))] * 1e3, 3)

    # 2/3. bulk transfers.  A fresh numpy buffer each way so no cache tricks.
    n_f32 = mb * 2**20 // 4
    host = np.random.RandomState(0).rand(n_f32).astype(np.float32)
    t_up = min(_t(lambda: jax.device_put(host, dev).block_until_ready(), n=3))
    out["device_put_MBps"] = round(mb / t_up, 1)
    # Each fetch needs its OWN freshly computed device array: fetching a
    # device_put result can be served from a cached host copy, and a
    # jax.Array memoizes its first np.asarray in _npy_value — either way a
    # repeat fetch measures no transfer (~TB/s readings).
    mul = jax.jit(lambda x, s: x * s)
    fresh = [mul(jax.device_put(host, dev), 1.0 + i * 1e-6) for i in range(3)]
    for a in fresh:
        a.block_until_ready()
    t_down = min(
        _t(lambda a=a: np.asarray(jax.device_get(a)), n=1)[0] for a in fresh
    )
    out["device_get_MBps"] = round(mb / t_down, 1)

    # 4. executable upload: same program, +mb MB of baked-in constants.
    #    Compile wall = trace + XLA compile + executable transfer; the delta
    #    between the big-constant and small-constant builds isolates the
    #    transfer of the extra bytes (XLA's work is near-identical: one
    #    constant + add).  Fresh shapes defeat the compile cache.
    #    The constants stay HOST numpy arrays: a device-array closure would
    #    be kept as a device buffer and nothing would ride the link.
    small_c = np.random.RandomState(1).rand(13, 257).astype(np.float32)
    big_c = (np.random.RandomState(2).rand(n_f32 // 257 * 257)
             .astype(np.float32).reshape(-1, 257))

    def compile_with(const):
        # Runtime-dependent row gather: XLA cannot constant-fold the big
        # constant away (a `const.sum(0)` closure folds to a 1 KB vector at
        # compile time, in which case the delta measures host-side folding,
        # not the link) — every row must survive into the shipped program.
        f = jax.jit(lambda x, i: x + jnp.asarray(const)[i])
        x = jnp.zeros((3, 257), jnp.float32)
        idx = jnp.zeros((3,), jnp.int32)
        t0 = time.perf_counter()
        f(x, idx).block_until_ready()
        return time.perf_counter() - t0

    t_small = compile_with(small_c)
    t_big = compile_with(big_c)
    const_mb = big_c.nbytes / 2**20
    out["compile_small_s"] = round(t_small, 2)
    out["compile_big_s"] = round(t_big, 2)
    if t_big > t_small:
        est = round(const_mb / (t_big - t_small), 1)
        out["executable_upload_MBps_est"] = est
        # Sanity bound: executables ride the same physical link as
        # device_put, so an estimate far above it means the constant never
        # actually shipped (folded or cached) — flag instead of reporting.
        if est > 5.0 * out["device_put_MBps"]:
            out["executable_upload_suspect"] = (
                "estimate exceeds 5x device_put MBps; constant likely "
                "did not ride the link"
            )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    res = measure(args.mb)
    if args.json:
        print(json.dumps(res))
    else:
        for k, v in res.items():
            print(f"{k:32} {v}")


if __name__ == "__main__":
    main()
