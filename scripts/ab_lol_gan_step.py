"""A/B the SumGAN 3-phase step at GAN x LOL sweep shapes on the real chip.

Round-4 calibration (see cli/benchmark.py DATASET_OVERRIDES "LOL"): the
sweep runs batch-4 int8-streaming split-phase steps, which is the WRONG
regime at small batch — the 2048-wide recurrences re-read their weights
every timestep, and at B=4 there is almost no compute to amortize it.  The
persistent-weight Pallas scans (nn/rnn_pallas.py) hold W_hh in VMEM across
the whole sequence but are disabled under int8 (rnn_lean._pallas_path), so
`int8=1` silently opts the sweep OUT of the fast path.  This script measures
the actual regimes, with the engine's compute policy entered the way
train_fold does (the earlier /tmp bisection script skipped compute_policy()
and therefore timed f32 streaming).

Usage (env vars):
  B=4 INT8=1           python scripts/ab_lol_gan_step.py   # sweep config
  B=4 INT8=0 BF16=1    python scripts/ab_lol_gan_step.py   # Pallas bf16
  B=6 INT8=0 BF16=1 T=2048 python scripts/ab_lol_gan_step.py

Prints one line per (first, steady) timing; exit 0 if the step ran.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from summarizer_tpu.utils.config import HParameters  # noqa: E402
from summarizer_tpu.data.hdf5 import SummarizerDataset  # noqa: E402
from summarizer_tpu.train.loop import make_engine  # noqa: E402


def main():
    B = int(os.environ.get("B", 4))
    T = int(os.environ.get("T", 0))  # 0 = worst (longest videos) bucket
    extra = {
        "batch_size": B,
        "pretrain_vae": 0,
        "remat": int(os.environ.get("REMAT", 1)),
        "bucket": 1,
        "split_phases": 1,
        "bucket_quantum": int(os.environ.get("QUANTUM", 1024)),
        "int8": int(os.environ.get("INT8", 1)),
        "bf16": int(os.environ.get("BF16", 0)),
        "donate": int(os.environ.get("DONATE", 1)),
        "pack_dtype": "bfloat16",
    }
    print("config:", extra)
    hps = HParameters()
    hps.load_from_args(dict(
        model="sumgan",
        datasets="datasets/summarizer_dataset_LOL_google_pool5.h5",
        splits_files="splits/LOL_splits.json",
        epochs=1, log_level="info", extra_params=extra,
    ))
    ds = SummarizerDataset("datasets/summarizer_dataset_LOL_google_pool5.h5")
    eng = make_engine(hps, ds, "LOL")
    feats, targets, mask = eng._full_train_pack()
    lens = np.asarray(eng._full_lengths)
    eng._host_lengths = lens
    print("pack", feats.shape, feats.dtype, "max len", lens.max())

    if T:
        ok = np.where(lens <= T)[0]
        sel = ok[np.argsort(lens[ok])[-B:]].astype(np.int32)
    else:
        sel = np.argsort(lens)[-B:].astype(np.int32)
    print("sel lens", lens[sel])

    cfg = eng._cfg()
    params = eng.init_params(jax.random.PRNGKey(0))
    opts, _ = eng.make_optimizers(params, cfg)
    opt_states = tuple(o.init(params) for o in opts)
    epoch_fn = eng._make_epoch_split(eng.phase_losses(cfg), opts)
    k = jax.random.PRNGKey(1)
    sel_dev = jnp.asarray(sel[None, :])

    with eng.compute_policy():
        t0 = time.time()
        params, opt_states, stats = epoch_fn(
            params, opt_states, feats, targets, mask, sel_dev, k, False)
        jax.block_until_ready(jax.tree.leaves(params)[0])
        first = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            params, opt_states, stats = epoch_fn(
                params, opt_states, feats, targets, mask, sel_dev, k, False)
            jax.block_until_ready(jax.tree.leaves(params)[0])
            times.append(time.time() - t0)
    print(f"RESULT B={B} T={T or int(lens.max())} int8={extra['int8']} "
          f"bf16={extra['bf16']} donate={extra['donate']}: "
          f"first={first:.1f}s steady={min(times):.2f}s "
          f"stats={[round(float(s), 4) for s in stats]}")


if __name__ == "__main__":
    main()
