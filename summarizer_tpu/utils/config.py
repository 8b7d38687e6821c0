"""Hyperparameter / experiment configuration.

Feature-parity with the reference ``HParameters`` (summarizer/utils/
config.py:21-200): class-attribute defaults overridden from an args dict
(comma-splitting list-typed flags), string model registry, split-file
shorthand resolution (minimal/overfit/tvsum/summe/LOL/all), per-split-file
dataset maps, timestamped log dirs, weights/preds paths, a dual logger, and
the open-ended ``extra_params`` channel for model-specific flags.

New (TPU) knobs: ``seed``, ``batch_size`` (videos per optimizer step; 1 ==
reference dynamics), ``data_parallel`` (device count for the sharded path),
``eval_device`` (run eval on-device vs the host oracle), ``precision``.
"""

from __future__ import annotations

import datetime
import inspect
import logging
import os
import shutil

from summarizer_tpu.data.splits import parse_splits_filename
from summarizer_tpu.models import REGISTRY, get_model
from summarizer_tpu.utils.logging_utils import MetricsWriter, make_logger


class Proportion:
    """argparse ``choices`` validator for a proportion in ]0, 1]
    (ref: summarizer/utils/__init__.py:19-31)."""

    def __eq__(self, value):
        return 0 < value <= 1

    def __contains__(self, item):
        return self.__eq__(item)

    def __iter__(self):
        yield "a proportion value in ]0, 1]"

    def __str__(self):
        return "a proportion value in ]0, 1]"


SHORTHANDS = {
    "minimal": ["splits/tvsum_splits_overfit.json"],
    "overfit": ["splits/tvsum_splits_overfit.json", "splits/summe_splits_overfit.json"],
    "tvsum": ["splits/tvsum_splits.json"],
    "summe": ["splits/summe_splits.json"],
    "LOL": ["splits/LOL_splits.json"],
    "all": [
        "splits/tvsum_splits.json",
        "splits/tvsum_splits_overfit.json",
        "splits/summe_splits.json",
        "splits/summe_splits_overfit.json",
        "splits/LOL_splits.json",
    ],
}


class HParameters:
    def __init__(self):
        # Reference defaults (summarizer/utils/config.py:25-56)
        self.weight_decay = 0.00001
        self.lr = 0.00005
        self.epochs = 10
        self.test_every_epochs = 2
        self.datasets = [
            "datasets/summarizer_dataset_summe_google_pool5.h5",
            "datasets/summarizer_dataset_tvsum_google_pool5.h5",
            "datasets/summarizer_dataset_LOL_google_pool5.h5",
        ]
        self.splits_files = "minimal"
        self.model = "logistic"
        self.extra_params: dict = {}
        self.summary_proportion = 0.15
        self.selection_algorithm = "knapsack"
        self.correlation_metric = "spearmanr"  # or "kendalltau" (host eval)
        self.log_level = "info"

        # TPU-native knobs (new)
        self.seed = 12345
        self.batch_size = 1  # videos per optimizer step; 1 == reference dynamics
        self.data_parallel = 0  # 0 = single device; N = shard videos over N devices
        self.seq_parallel = 0  # N = shard the time axis over N devices
        # (vasnet/transformer; parallel/sequence_parallel.py)
        self.pipeline_parallel = 0  # N = stage the encoder stack over N
        # devices, GPipe-style (transformer; parallel/pipeline_parallel.py)
        self.expert_parallel = 0  # N = shard the MoE expert banks over N
        # devices (transformer_moe; parallel/expert_parallel.py)
        self.fold_parallel = 0  # 1 = train all CV folds simultaneously as
        # one vmapped program (supervised + reinforce engines;
        # train/supervised.py, train/reinforce.py)
        self.fused = 1  # with fold_parallel: run the WHOLE CV (all epochs +
        # evals + best-weights tracking) as ONE XLA dispatch — the remote-TPU
        # tunnel's per-dispatch round trip (~1-2 s) otherwise dominates the
        # wall-clock of small-model sweeps.  0 = per-epoch dispatches.
        self.eval_device = True  # batched on-device eval vs host oracle
        self.tensorboard = True
        self.log_root = "logs"
        self.log_dir = None  # override the timestamped default
        self.profile = False  # capture a jax.profiler trace of one epoch
        self.resume = False  # save per-epoch train state and resume from it
        self.resume_path = None  # override the per-fold state path
        self.init_weights = None  # warm-start every fold's params from a
        # .ckpt (e.g. a reference .pth imported via cli.import_weights) —
        # fine-tuning a migrated checkpoint instead of training from scratch

    # ------------------------------------------------------------- load/init
    def load_from_args(self, args: dict):
        for key, val in args.items():
            if val is not None:
                if hasattr(self, key) and isinstance(getattr(self, key), list):
                    val = val.split(",") if isinstance(val, str) else val
                setattr(self, key, val)
        if self.model not in REGISTRY:
            raise KeyError(f"{self.model} model is not known")
        if int(getattr(self, "seq_parallel", 0) or 0) > 1 and self.model not in (
            "vasnet",
            "transformer",
        ):
            raise ValueError(
                f"--seq_parallel supports vasnet/transformer, not "
                f"{self.model}: recurrent scorers are time-sequential — "
                f"shard videos with --data_parallel instead"
            )
        if (
            int(getattr(self, "pipeline_parallel", 0) or 0) > 1
            and self.model != "transformer"
        ):
            raise ValueError(
                f"--pipeline_parallel stages a deep encoder stack; only the "
                f"transformer scorer has one (got {self.model})"
            )
        if (
            int(getattr(self, "expert_parallel", 0) or 0) > 1
            and self.model != "transformer_moe"
        ):
            raise ValueError(
                f"--expert_parallel shards MoE expert banks; only "
                f"transformer_moe has them (got {self.model})"
            )
        self._init()
        return self

    def _init(self):
        self.model_spec = get_model(self.model)

        # Persistent XLA compile cache: folds/epochs/runs skip recompiles.
        try:
            import jax

            cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

        if self.log_dir:
            self.log_path = self.log_dir
        else:
            stamp = str(int(datetime.datetime.now().timestamp()))
            self.log_path = os.path.join(
                self.log_root, f"{stamp}_{self.model_spec.name}"
            )
        os.makedirs(self.log_path, exist_ok=True)

        if isinstance(self.splits_files, str):
            self.splits_files = SHORTHANDS.get(
                self.splits_files, [s for s in self.splits_files.split(",") if s]
            )

        self.dataset_name_of_file = {}
        self.dataset_of_file = {}
        self.splits_of_file = {}
        for sf in self.splits_files:
            name, splits = parse_splits_filename(sf)
            self.dataset_name_of_file[sf] = name
            # Augmented cross-dataset splits use dataset-qualified keys
            # ("<dataset>/<video>"); bind ALL dataset files then.
            sample = (splits[0]["train_keys"] + splits[0]["test_keys"])[:1] if splits else []
            if sample and "/" in sample[0]:
                self.dataset_of_file[sf] = list(self.datasets)
            else:
                ds = self.get_dataset_by_name(name)
                if ds is None:
                    raise FileNotFoundError(
                        f"No dataset path matches '{name}' in {self.datasets}"
                    )
                self.dataset_of_file[sf] = ds[-1]
            self.splits_of_file[sf] = splits

        self.weights_path = {}
        self.pred_path = {}
        for sf in self.splits_files:
            base = os.path.basename(sf)
            self.weights_path[sf] = os.path.join(self.log_path, f"{base}.ckpt")
            self.pred_path[sf] = os.path.join(self.log_path, f"{base}_preds.h5")

        self.logger = make_logger(
            self.log_path, getattr(logging, str(self.log_level).upper(), logging.INFO)
        )
        self.writer = MetricsWriter(self.log_path, tensorboard=self.tensorboard)

        # Provenance: copy the model source into the log dir
        # (ref: summarizer/utils/config.py:162-165)
        try:
            src = inspect.getfile(self.model_spec.module)
            shutil.copyfile(src, os.path.join(self.log_path, os.path.basename(src)))
        except Exception:
            pass

    def get_dataset_by_name(self, name: str):
        matches = [d for d in self.datasets if name in d]
        return matches or None

    # --------------------------------------------------------------- display
    _SHOW = [
        "model",
        "lr",
        "weight_decay",
        "epochs",
        "test_every_epochs",
        "summary_proportion",
        "selection_algorithm",
        "batch_size",
        "data_parallel",
        "seq_parallel",
        "pipeline_parallel",
        "expert_parallel",
        "fold_parallel",
        "seed",
        "log_path",
        "splits_files",
        "extra_params",
    ]

    def __str__(self):
        return "\n".join(
            f"[{i}] {k}: {getattr(self, k, None)}" for i, k in enumerate(self._SHOW)
        )

    def get_full_hps_dict(self):
        return {k: getattr(self, k) for k in ("weight_decay", "lr", "epochs")}
