"""Convert trained checkpoints between the reference and this framework.

Forward (default): a reference ``.pth`` (torch state_dict, as written by
summarizer/models/__init__.py:179-183) becomes a ``.ckpt`` msgpack param
pytree usable by this framework's eval/predict/serve paths — architecture
hyper-parameters are inferred from the checkpoint's shapes where possible
(layer counts, hidden sizes, cell type, learned pos-embeds).

Reverse (``--reverse``): a ``.ckpt`` becomes a ``.pth`` the reference's
strict ``load_state_dict`` accepts (duplicate norm registrations and the
deep-copied prototype encoder layers included), so a TPU-trained model can
be loaded back by the reference code.

Optionally ``--predict out.h5 --datasets data.h5`` runs full-dataset
prediction with the imported weights and writes the reference-layout preds
h5 (scores / user_summary / machine_summary / machine_scores per video),
ready for ``cli.summary`` mp4 export or ``cli.figures``.

Usage:
    python -m summarizer_tpu.cli.import_weights -m vasnet \\
        -i logs/ref/tvsum_splits.pth -o vasnet_tvsum.ckpt \\
        [--param local=60] [--predict preds.h5 --datasets tvsum.h5]
    python -m summarizer_tpu.cli.import_weights -m vasnet --reverse \\
        -i vasnet_tvsum.ckpt -o vasnet_tvsum.pth
"""

from __future__ import annotations

import argparse
import ast
import sys

from summarizer_tpu.utils.torch_import import (
    IMPORTABLE,
    export_state_dict,
    import_state_dict,
    infer_hp,
)


def _parse_params(pairs):
    hp = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        if not _:
            raise SystemExit(f"--param expects key=value, got {pair!r}")
        try:
            hp[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            hp[key] = val
    return hp


def _load_pth(path: str, allow_pickle: bool = False) -> dict:
    import torch

    try:
        try:
            sd = torch.load(path, map_location="cpu", weights_only=True)
        except TypeError:  # older torch without weights_only
            sd = torch.load(path, map_location="cpu")
    except Exception as e:
        # weights_only=True refuses pickled nn.Modules (UnpicklingError on
        # modern torch).  Unpickling executes arbitrary code, so retrying
        # with weights_only=False is explicit opt-in.
        if not allow_pickle:
            raise SystemExit(
                f"could not load {path} as a plain state_dict ({e}). If the "
                f"file contains a pickled torch module, re-run with "
                f"--allow-pickle (executes the file's pickle code)."
            )
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # a whole module was saved
        sd = sd.state_dict()
    # DataParallel-trained references prefix every key with 'module.';
    # normalize once here so hp inference and import see the same names.
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in dict(sd).items()
    }


def main(argv=None):
    p = argparse.ArgumentParser(
        "summarizer_tpu : import/export reference checkpoints",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("-m", "--model", required=True, choices=IMPORTABLE)
    p.add_argument("-i", "--input", required=True, help=".pth (or .ckpt with --reverse)")
    p.add_argument("-o", "--output", required=True, help=".ckpt (or .pth with --reverse)")
    p.add_argument("--reverse", action="store_true",
                   help="Convert .ckpt -> .pth instead of .pth -> .ckpt")
    p.add_argument("--param", action="append", metavar="KEY=VALUE",
                   help="Architecture hp override (repeatable), e.g. --param local=60; "
                        "shapes-visible hps (hidden sizes, layer counts) are inferred")
    p.add_argument("--predict", metavar="PREDS_H5",
                   help="After import, run full-dataset prediction with the "
                        "imported weights and write the reference-layout preds h5")
    p.add_argument("--datasets", help="Dataset h5 path (required with --predict)")
    p.add_argument("--splits", help="Splits JSON for --predict on a dataset "
                                    "without a canonical splits/<name>_splits.json")
    p.add_argument("--allow-pickle", action="store_true",
                   help="Permit loading a .pth that pickles a whole torch "
                        "module (executes its pickle code; default refuses)")
    args = p.parse_args(argv)
    hp_over = _parse_params(args.param)

    if args.reverse:
        import jax

        from summarizer_tpu.models import get_model
        from summarizer_tpu.train.checkpoint import load_params

        template = get_model(args.model).module.init(jax.random.PRNGKey(0), hp_over)
        try:
            params = load_params(args.input, template)
        except Exception as e:  # shape/structure mismatch -> actionable hint
            raise SystemExit(
                f"could not restore {args.input} against the default "
                f"{args.model} architecture ({e}); pass --param overrides "
                f"matching the trained architecture (e.g. --param hidden_size=512)"
            )
        sd = export_state_dict(args.model, params)
        import torch

        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.output)
        print(f"{args.input} -> {args.output} ({len(sd)} tensors, torch state_dict)")
        return

    sd = _load_pth(args.input, allow_pickle=args.allow_pickle)
    hp = {**infer_hp(args.model, sd), **hp_over}
    if args.model in ("vasnet", "transformer") and "pos_embed" not in hp_over \
            and not any(".pos" in k or "pos_embed" in k for k in sd):
        # The reference stores the sinusoidal ('attention') pos-embed table
        # as an unregistered attribute (summarizer/models/vasnet.py:43-50),
        # so a .pth cannot reveal whether it was trained with one; only the
        # learned 'simple' table shows up in the state_dict.
        print("note: no positional-embedding tensor in the checkpoint. If "
              "the reference run used --pos_embed attention, pass "
              "--param pos_embed=attention --param max_pos=<N> (not "
              "inferable from the file); otherwise predictions will diverge.")
    params = import_state_dict(args.model, sd, hp_over)
    from summarizer_tpu.train.checkpoint import save_params

    save_params(args.output, params)
    n = sum(1 for _ in _leaves(params))
    print(f"{args.input} -> {args.output} ({n} arrays; inferred hp: {hp})")

    if args.predict:
        if not args.datasets:
            raise SystemExit("--predict requires --datasets <dataset.h5>")
        import os
        import re

        from summarizer_tpu.data.hdf5 import SummarizerDataset
        from summarizer_tpu.train.loop import make_engine, predict_dataset
        from summarizer_tpu.utils.config import HParameters

        # HParameters binds splits files to datasets by name; pick the
        # canonical splits file matching the h5 so the config resolves.
        m = re.search(r"summarizer_dataset_(\w+?)_", os.path.basename(args.datasets))
        ds_name = m.group(1) if m else os.path.splitext(os.path.basename(args.datasets))[0]
        sf = args.splits or os.path.join("splits", f"{ds_name}_splits.json")
        if not os.path.exists(sf):
            # Without this, HParameters falls back to the 'minimal' shorthand
            # and dies resolving 'tvsum' against an unrelated dataset path.
            raise SystemExit(
                f"no splits file for dataset {ds_name!r} (looked for {sf}); "
                f"pass --splits <file.json> (prediction covers the whole "
                f"dataset, so any splits file over its keys works)"
            )
        hps_args = {
            "model": args.model,
            "datasets": args.datasets,
            "extra_params": dict(hp),
            "tensorboard": False,
            "log_level": "error",
            "splits_files": sf,
        }
        hps = HParameters()
        hps.load_from_args(hps_args)
        dataset = SummarizerDataset(args.datasets)
        engine = make_engine(hps, dataset, ds_name)
        predict_dataset(engine, params, args.predict)
        print(f"predictions -> {args.predict}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    sys.exit(main())
