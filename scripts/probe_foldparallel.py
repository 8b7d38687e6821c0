"""Explain bench.py's fold-parallel k=5 steady-state 0.60x row (VERDICT r4
weak #4b) with component probes, on the attached TPU:

  1. sequential epoch (batch-1 scan over 32 videos)        — the 1x baseline
  2. fold-parallel k=5 stacked epoch (vmapped)             — the 0.60x row
  3. k=5 stacked epoch WITHOUT per-fold Adam (SGD)         — isolates whether
     the vmapped per-fold optimizer (5x moment traffic per step) is the gap
  4. batch-5 epoch (same matmul batch as the k=5 vmap,
     shared params)                                        — the "ideal" 5-way
     batching the vmap should approach

Prints videos/s for each; the pairwise ratios name the stall.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from summarizer_tpu.models import vasnet
    from summarizer_tpu.train.optim import torch_adam
    from summarizer_tpu.train.supervised import make_epoch_fn

    rng = np.random.RandomState(0)
    feats, targets = bench.make_data(rng)
    n, t, d = feats.shape

    print("1) sequential batch-1 epoch (bench_jax)")
    vps1, _ = bench.bench_jax(feats, targets)

    print("2) fold-parallel k=5 stacked epoch (bench_jax_folds)")
    vps2, _ = bench.bench_jax_folds(feats, targets, k=5)

    print("3) k=5 stacked epoch, plain SGD (no per-fold Adam moments)")
    import optax

    hp = {"input_size": d}
    k5 = 5
    params = vasnet.init(jax.random.PRNGKey(0), hp)
    stack = jax.tree.map(lambda a: jnp.stack([a] * k5), params)
    opt = optax.sgd(1e-4)
    opt_state = jax.vmap(opt.init)(stack)
    epoch_fn = make_epoch_fn(vasnet.apply, hp, opt, True, 1)
    ep_v = jax.vmap(epoch_fn, in_axes=(0, 0, None, None, None, None, None))

    fx = jax.device_put(jnp.asarray(feats))
    tx = jax.device_put(jnp.asarray(targets))
    mx = jnp.ones((n, t), jnp.float32)
    perm = jnp.arange(n)
    key = jax.random.PRNGKey(1)
    stack, opt_state, loss = ep_v(stack, opt_state, fx, tx, mx, perm, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(bench.EPOCHS_TIMED):
        stack, opt_state, loss = ep_v(stack, opt_state, fx, tx, mx, perm, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    vps3 = k5 * n * bench.EPOCHS_TIMED / dt
    print(f"   {vps3:.1f} videos/s aggregate (SGD)")

    print("4) k=5 stacked epoch, per-fold torch-Adam (the real config)")
    opt_a = torch_adam(5e-5, 1e-5)
    stack = jax.tree.map(lambda a: jnp.stack([a] * k5), params)
    opt_state_a = jax.vmap(opt_a.init)(stack)
    epoch_fn_a = make_epoch_fn(vasnet.apply, hp, opt_a, True, 1)
    ep_va = jax.vmap(epoch_fn_a, in_axes=(0, 0, None, None, None, None, None))
    stack, opt_state_a, loss = ep_va(stack, opt_state_a, fx, tx, mx, perm, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(bench.EPOCHS_TIMED):
        stack, opt_state_a, loss = ep_va(stack, opt_state_a, fx, tx, mx, perm, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    vps4 = k5 * n * bench.EPOCHS_TIMED / dt
    print(f"   {vps4:.1f} videos/s aggregate (torch-Adam)")

    print("5) batch-5 shared-params epoch (ideal 5-way batching)")
    vps5, _ = bench.bench_jax_batched(feats, targets, batch=5)

    print(f"\nratios vs sequential: fold5 {vps2 / vps1:.2f}  "
          f"fold5-SGD {vps3 / vps1:.2f}  fold5-Adam {vps4 / vps1:.2f}  "
          f"batch5 {vps5 / vps1:.2f}")


if __name__ == "__main__":
    main()
