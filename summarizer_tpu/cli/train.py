"""Training CLI (ref: summarizer/main.py:75-104).

Known flags mirror the reference (same short options); any unknown
``--flag [value]`` pair becomes ``extra_params[flag] = value`` for
model-specific knobs (main.py:91-92), e.g. ``--local 30`` for the VASNet
attention aperture.
"""

from __future__ import annotations

import argparse

from summarizer_tpu.utils.config import HParameters, Proportion


def parse_extra(unknown: list[str]) -> dict:
    """--key value / bare --switch pairs -> {key: value|True}."""
    extra: dict = {}
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if tok.startswith("-"):
            key = tok.lstrip("-")
            if i + 1 < len(unknown) and not unknown[i + 1].startswith("-"):
                extra[key] = unknown[i + 1]
                i += 2
            else:
                extra[key] = True
                i += 1
        else:
            i += 1
    return extra


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("summarizer_tpu : Model Training")
    p.add_argument("-s", "--splits-files", type=str,
                   help="Comma separated list of split files (shorthands: minimal, overfit, tvsum, summe, LOL, all)")
    p.add_argument("-m", "--model", type=str, help="Model name (random|logistic|vasnet|transformer|transformer_moe|dsn|sumgan|sumgan_att)")
    p.add_argument("-e", "--epochs", type=int, help="Number of epochs")
    p.add_argument("-r", "--lr", type=float, help="Learning rate")
    p.add_argument("-d", "--weight-decay", type=float, help="Weight decay (L2 penalty)")
    p.add_argument("-t", "--test-every-epochs", type=int, help="Evaluate every nth epoch")
    p.add_argument("-p", "--summary-proportion", type=float, choices=Proportion(),
                   help="Summary length as a proportion of the video")
    p.add_argument("-a", "--selection-algorithm", choices=["knapsack", "rank"],
                   help="Keyshot selection algorithm")
    p.add_argument("-l", "--log-level", choices=["critical", "error", "warning", "info", "debug"],
                   default="info")
    p.add_argument("--datasets", type=str, help="Comma separated dataset h5 paths")
    p.add_argument("--correlation-metric", choices=["spearmanr", "kendalltau"],
                   help="Rank correlation for score eval (both run on device)")
    p.add_argument("--batch-size", type=int, help="Videos per optimizer step (1 = reference dynamics)")
    p.add_argument("--data-parallel", type=int, help="Shard videos over N devices")
    p.add_argument("--seq-parallel", type=int,
                   help="Shard the time axis over N devices (vasnet/transformer)")
    p.add_argument("--pipeline-parallel", type=int,
                   help="Stage the encoder stack over N devices, GPipe-style (transformer)")
    p.add_argument("--expert-parallel", type=int,
                   help="Shard the MoE expert banks over N devices (transformer_moe)")
    p.add_argument("--fold-parallel", type=int,
                   help="1 = train all CV folds simultaneously as one vmapped program (supervised models)")
    p.add_argument("--fused", type=int,
                   help="1 (default) = run a whole training fold (or the whole"
                        " fold-parallel CV) as ONE XLA dispatch; 0 = per-epoch"
                        " dispatches (needed for --profile/scan_chunk; also"
                        " faster for big encoders on remote-tunneled TPUs"
                        " where executable upload dominates)")
    p.add_argument("--seed", type=int, help="PRNG seed")
    p.add_argument("--log-dir", type=str, help="Override the timestamped log dir")
    p.add_argument("--no-tensorboard", dest="tensorboard", action="store_false", default=None)
    p.add_argument("--profile", action="store_true", default=None,
                   help="Capture a jax.profiler trace of the first epoch")
    p.add_argument("--init-weights", type=str,
                   help="Warm-start params from a .ckpt (e.g. an imported "
                        "reference .pth, see cli.import_weights)")
    p.add_argument("--resume", action="store_true", default=None,
                   help="Checkpoint full train state each epoch and resume from it")
    return p


def main(argv=None):
    args, unknown = build_parser().parse_known_args(argv)
    hps_init = {k: v for k, v in vars(args).items()}
    hps_init["extra_params"] = parse_extra(unknown)

    hps = HParameters()
    hps.load_from_args(hps_init)
    print("Hyperparameters:")
    print("-" * 70)
    print(hps)
    print("-" * 70)

    from summarizer_tpu.train.loop import train

    results = train(hps)
    hps.writer.close()
    return results


if __name__ == "__main__":
    main()
