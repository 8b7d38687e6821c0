"""Run ONE summarizer_tpu training config and emit a JSON result line.

Counterpart of parity_ref_worker.py: identical datasets, splits, budgets and
eval protocol, run through the TPU-native stack (on whatever accelerator is
attached — the real chip under the driver, CPU if forced).

Usage: python scripts/parity_ours_worker.py '<json config>'
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv):
    cfg = json.loads(argv[1])
    os.chdir(REPO)
    sys.path.insert(0, REPO)

    from summarizer_tpu.train.loop import train
    from summarizer_tpu.utils.config import HParameters

    hps_init = {
        "model": cfg["model"],
        "splits_files": list(cfg["splits_files"]),
        "epochs": cfg.get("epochs"),
        "lr": cfg.get("lr"),
        "weight_decay": cfg.get("weight_decay"),
        "test_every_epochs": cfg.get("test_every_epochs"),
        "log_level": "error",
        "tensorboard": False,
        "seed": cfg.get("seed", 12345),
        "extra_params": cfg.get("extra_params", {}),
        "log_dir": cfg.get("log_dir"),
    }
    hps = HParameters().load_from_args(hps_init)

    t0 = time.time()
    results = train(hps)
    wall = time.time() - t0

    import jax

    out = {
        "stack": f"summarizer_tpu-{jax.devices()[0].platform}",
        "name": cfg["name"],
        "model": cfg["model"],
        "epochs": cfg.get("epochs"),
        "seed": int(hps.seed),
        "wall_s": round(wall, 1),
        "results": [
            {
                "splits_file": os.path.basename(sf),
                "corr": round(float(c), 5),
                "avg_f1": round(float(a), 5),
                "max_f1": round(float(m), 5),
            }
            for sf, c, a, m in results
        ],
    }
    print("PARITY_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main(sys.argv)
