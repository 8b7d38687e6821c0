"""Minimized standalone repro of the (group=20, T=648) TPU worker abort.

On the axon-tunneled v5e worker, the SumGAN 3-phase train step at a
20-video group over a 648-step padded pack aborts the worker process
deterministically (QUIRKS.md "Environment quirks"; bisected 2026-08-19:
independent of int8/bf16, remat, split_phases, and the Pallas RNN kernels;
VAE pretrain at the same shape runs; (20, 640) runs; (16, 648) runs).

This script rebuilds ONLY the fatal program — the 3 masked-Adam phase steps
of SumGAN over synthetic data at a chosen (group, T) — so the platform bug
report has a one-file repro.  DANGER: at the default fatal shape it is
expected to KILL the TPU worker; it refuses to run without --yes.

Usage:
  python scripts/repro_worker_abort.py --group 20 --t 648 --yes   # crashes
  python scripts/repro_worker_abort.py --group 16 --t 648 --yes   # runs
  python scripts/repro_worker_abort.py --group 20 --t 640 --yes   # runs
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=20)
    ap.add_argument("--t", type=int, default=648)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--yes", action="store_true",
                    help="acknowledge this may kill the TPU worker")
    ap.add_argument("--no-guard", action="store_true",
                    help="bypass the repo's shape guard (default: bypassed; "
                         "flag kept for symmetry)")
    args = ap.parse_args()
    if not args.yes:
        print("Refusing to run without --yes: the default shape is expected "
              "to ABORT the TPU worker (QUIRKS.md).")
        sys.exit(2)

    import numpy as np

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The image's sitecustomize force-registers the TPU plugin; honor a
        # CPU request (tiny-shape wiring checks) before backend init.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from summarizer_tpu.models import sumgan
    from summarizer_tpu.train.adversarial import SumGANEngine

    class _Log:
        def __getattr__(self, k):
            return lambda *a, **kw: None

    class _Hps:
        lr, weight_decay, epochs, seed, batch_size = 5e-5, 1e-5, 1, 0, 20
        extra_params: dict = {}
        logger = _Log()
        writer = None

    g, t, d = args.group, args.t, args.dim
    print(f"building SumGAN 3-phase step at (group={g}, T={t}, D={d}) "
          f"on {jax.devices()[0]}")

    # Engine shell: enough state for make_optimizers/make_epoch_fn without a
    # dataset (the fatal program depends only on the (g, t, d) shapes).
    eng = SumGANEngine.__new__(SumGANEngine)
    eng.hps = _Hps()
    eng.hp = {"batch_size": g}
    eng.log = _Log()
    eng.history = {}

    hp = {"input_size": d}
    params = sumgan.init(jax.random.PRNGKey(0), hp)
    cfg = eng._cfg()
    opts, _ = eng.make_optimizers(params, cfg)
    epoch_fn = eng.make_epoch_fn(opts, cfg)
    opt_states = tuple(o.init(params) for o in opts)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(g, t, d).astype(np.float32))
    targets = jnp.asarray(rng.rand(g, t).astype(np.float32))
    mask = jnp.ones((g, t), jnp.float32)
    sel = jnp.arange(g, dtype=jnp.int32)[None, :]  # one group

    print("dispatching (compile + run)...", flush=True)
    t0 = time.time()
    params, opt_states, stats = epoch_fn(
        params, opt_states, feats, targets, mask, sel,
        jax.random.PRNGKey(1), True,
    )
    print(f"survived: {time.time() - t0:.1f}s  "
          f"stats={[float(s) for s in stats]}")


if __name__ == "__main__":
    main()
