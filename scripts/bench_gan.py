"""SumGAN throughput sweep over video-group size (VERDICT r1 item 3).

Times the full 3-phase adversarial update on the attached device at several
``batch_size`` (video group) values, with the bf16 streaming policy active
(as in real training).  The 2048-wide VAE is HBM-weight-streaming-bound, so
videos/s scales with group size until activation residuals exhaust HBM
(~group 32 at T=640 with the lean-VJP LSTM layers).

Each 3-phase step is timed with a forced scalar fetch — on the tunneled
device, block_until_ready alone under-reports.

Usage: python scripts/bench_gan.py [groups...]   (default: 8 16 32)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from summarizer_tpu.data.batching import pack_train
from summarizer_tpu.data.hdf5 import SummarizerDataset
from summarizer_tpu.train.loop import make_engine
from summarizer_tpu.utils.config import HParameters


def bench_group(bs: int, int8: bool = False):
    hps = HParameters().load_from_args(
        {
            "model": "sumgan",
            "splits_files": ["splits/tvsum_splits.json"],
            "epochs": 2,
            "log_level": "error",
            "tensorboard": False,
            "extra_params": {"pretrain_vae": 0, "batch_size": bs, "bf16": 1,
                             "scan_chunk": 1, "int8": int(int8)},
        }
    )
    sf = hps.splits_files[0]
    dataset = SummarizerDataset(hps.dataset_of_file[sf])
    engine = make_engine(hps, dataset, hps.dataset_name_of_file[sf])
    split = hps.splits_of_file[sf][0]
    train_keys = list(split["train_keys"])
    n = len(train_keys)

    pack = pack_train(engine.dataset.subset(train_keys), t_max=engine.t_max)
    feats = jax.device_put(pack.features)
    targets = jax.device_put(pack.targets)
    mask = jax.device_put(pack.mask)

    cfg = engine._cfg()
    params = engine.init_params(jax.random.PRNGKey(1))
    opts, opt_states = engine.make_optimizers(params, cfg)
    rng = jax.random.PRNGKey(0)
    with engine.compute_policy():
        epoch_fn = engine.make_epoch_fn(opts, cfg)
        sel = (np.arange(bs).reshape(1, bs) % n).astype(np.int32)
        p2, s2, st = epoch_fn(params, opt_states, feats, targets, mask, sel, rng, False)
        _ = [float(v) for v in st]  # compile + full sync
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            p2, s2, st = epoch_fn(p2, s2, feats, targets, mask, sel, rng, False)
            _ = [float(v) for v in st]
        dt = (time.perf_counter() - t0) / reps
    print(
        f"group={bs:3d}{' int8' if int8 else ''}: {dt:6.2f}s per 3-phase step "
        f"-> {bs / dt:7.2f} videos/s "
        f"(T={feats.shape[1]}, split_phases={bs >= 24})",
        flush=True,
    )
    return bs / dt


def main(argv):
    int8 = "--int8" in argv
    groups = [int(a) for a in argv[1:] if a != "--int8"] or [8, 16, 32]
    for bs in groups:
        try:
            bench_group(bs, int8=int8)
        except Exception as e:
            print(f"group={bs:3d}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main(sys.argv)
