"""Knapsack: native C++ == numpy DP == brute force == jitted scan DP."""

import itertools
import random

import jax.numpy as jnp
import numpy as np

from summarizer_tpu.native import load_native
from summarizer_tpu.ops.eval_jax import knapsack_picks, rank_greedy_picks
from summarizer_tpu.ops.knapsack import knapsack_solve, knapsack_solve_py


def brute_force_value(values, weights, capacity):
    n = len(values)
    best = 0
    for mask in range(1 << n):
        w = sum(weights[i] for i in range(n) if mask >> i & 1)
        if w <= capacity:
            best = max(best, sum(values[i] for i in range(n) if mask >> i & 1))
    return best


def test_python_dp_optimal_and_feasible():
    rng = random.Random(1)
    for _ in range(100):
        n = rng.randint(0, 11)
        vals = [rng.randint(0, 40) for _ in range(n)]
        wts = [rng.randint(1, 9) for _ in range(n)]
        cap = rng.randint(0, 30)
        picks = knapsack_solve_py(vals, wts, cap)
        assert sum(wts[i] for i in picks) <= cap
        assert sum(vals[i] for i in picks) == brute_force_value(vals, wts, cap)
        assert picks == sorted(picks)


def test_native_matches_python():
    nat = load_native()
    assert nat is not None, "native build failed"
    rng = random.Random(2)
    for _ in range(200):
        n = rng.randint(0, 14)
        vals = [rng.randint(0, 100) for _ in range(n)]
        wts = [rng.randint(1, 12) for _ in range(n)]
        cap = rng.randint(0, 60)
        assert nat.knapsack(vals, wts, cap) == knapsack_solve_py(vals, wts, cap)


def test_jax_scan_dp_matches_host():
    import jax
    from functools import partial

    kp = jax.jit(partial(knapsack_picks, max_capacity=64))
    rng = random.Random(3)
    for _ in range(50):
        n = rng.randint(1, 10)
        vals = [rng.randint(0, 50) for _ in range(n)]
        wts = [rng.randint(1, 8) for _ in range(n)]
        cap = rng.randint(1, 40)
        pad = 16
        v = jnp.zeros(pad, jnp.int32).at[:n].set(jnp.array(vals))
        w = jnp.zeros(pad, jnp.int32).at[:n].set(jnp.array(wts))
        picks = np.asarray(kp(v, w, jnp.int32(n), jnp.int32(cap)))
        got = sorted(int(i) for i in np.nonzero(picks[:n])[0])
        assert not picks[n:].any(), "padding items must never be picked"
        assert got == knapsack_solve_py(vals, wts, cap), (vals, wts, cap)


def test_rank_greedy_matches_reference_semantics():
    """Greedy by descending score, strict < budget, skip-not-stop
    (summarizer/utils/eval.py:102-109).  Tie order: the reference uses an
    unstable quicksort argsort, so we pin the deterministic stable-sort
    order (ties highest-index first) on both host and device."""
    import jax

    rg = jax.jit(rank_greedy_picks)
    rng = np.random.RandomState(4)
    for _ in range(50):
        n = rng.randint(1, 12)
        scores = np.round(rng.rand(n) * 4) / 4  # force ties
        wts = rng.randint(1, 9, size=n)
        cap = int(rng.randint(1, 40))
        # host semantics (stable tie order, as ops/eval_np.select_segments)
        picks_ref = []
        total = 0
        for i in np.argsort(scores, kind="stable")[::-1]:
            if total + wts[i] < cap:
                picks_ref.append(int(i))
                total += int(wts[i])
        pad = 16
        s = jnp.full(pad, -1.0).at[:n].set(jnp.array(scores, jnp.float32))
        w = jnp.zeros(pad, jnp.int32).at[:n].set(jnp.array(wts, jnp.int32))
        got = np.nonzero(np.asarray(rg(s, w, jnp.int32(n), jnp.int32(cap))))[0]
        assert sorted(picks_ref) == [int(i) for i in got], (scores, wts, cap)
