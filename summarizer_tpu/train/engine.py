"""Engine base: the fold protocol shared by all training paradigms.

Reproduces the reference Trainer contract (summarizer/models/__init__.py:9-187)
— reset per fold, train(fold) -> best (corr, avgF1, maxF1) by test correlation,
test() over the fold's test keys, predict_dataset over every video — on top of
packed device tensors and one jitted eval program per fold.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from summarizer_tpu.data.batching import eval_static_dims, pack_eval
from summarizer_tpu.data.hdf5 import SummarizerDataset
from summarizer_tpu.ops import eval_np
from summarizer_tpu.ops.eval_jax import evaluate_batch


@dataclass
class FoldResult:
    best_corr: float
    best_avg_f1: float
    best_max_f1: float
    best_params: Any


class Engine:
    """One model family on one dataset; drives folds."""

    def __init__(self, spec, hps, dataset: SummarizerDataset, dataset_name: str):
        self.spec = spec
        self.hps = hps
        self.dataset = dataset
        self.dataset_name = dataset_name
        self.hp = dict(hps.extra_params or {})
        self.log = hps.logger
        self.writer = hps.writer
        # Dataset-global paddings: every fold of a CV run shares the same
        # static shapes, so XLA compiles each program once per (model,
        # dataset) instead of once per fold.
        all_records = list(dataset.videos.values())
        from summarizer_tpu.data.batching import round_up

        self.t_max = round_up(max(r.n_steps for r in all_records), 8)
        sp = int(getattr(hps, "seq_parallel", 0) or 0)
        if sp > 1:
            # Sequence-parallel shards need T divisible by the mesh size.
            import math

            self.t_max = round_up(self.t_max, math.lcm(8, sp))
        self.eval_dims = eval_static_dims(all_records, float(hps.summary_proportion))
        #: every scalar() call is also kept host-side, keyed by (phase, tag),
        #: so tests can assert learning trends (loss falling, reward rising,
        #: discriminator separating real/fake) instead of mere finiteness.
        self.history: dict[tuple[str, str], list[float]] = {}

    # ------------------------------------------------------------------ eval
    def _device_eval_program(self):
        """The jitted full-eval program: model forward + upsample + rank
        correlation + knapsack/rank selection + F1, one XLA program.

        Built once per ENGINE, not per fold: eval dims are dataset-global
        (see __init__), so every fold shares shapes and re-jitting per fold
        would only re-trace the same computation.  Pure in (params, rng,
        feats, mask, batch) — fold-parallel training vmaps it over a stacked
        fold axis (train/supervised.py:train_folds)."""
        eval_program = getattr(self, "_eval_program", None)
        if eval_program is not None:
            return eval_program
        prop = float(self.hps.summary_proportion)
        method = str(self.hps.selection_algorithm)
        corr_metric = str(getattr(self.hps, "correlation_metric", "spearmanr"))
        _, _, _, f, cap = self.eval_dims
        apply_fn = self.spec.module.apply
        hp = self.hp

        @jax.jit
        def eval_program(params, rng, feats, mask, batch):
            scores = apply_fn(params, feats, mask, rng=rng, train=False, hp=hp)
            corr, af1, mf1 = evaluate_batch(
                scores,
                batch,
                proportion=prop,
                method=method,
                max_capacity=cap,
                out_frames=f,
                metric=corr_metric,
            )
            return corr.mean(), af1.mean(), mf1.mean()

        self._eval_program = eval_program
        return eval_program

    def make_eval_fn(self, keys: list[str]):
        """Compile the full test pass: model forward + upsample + Spearman +
        knapsack/rank + F1 for every video, one XLA program."""
        records = self.dataset.subset(keys)
        prop = float(self.hps.summary_proportion)
        method = str(self.hps.selection_algorithm)
        corr_metric = str(getattr(self.hps, "correlation_metric", "spearmanr"))
        # Both metrics run on device: Spearman as rank-Pearson, Kendall tau-b
        # as blocked O(F^2) pairwise sign sums (ops/ranking.py:kendall_masked,
        # scipy-parity tested) — no silent host fallback.
        use_device = bool(self.hps.eval_device) and corr_metric in (
            "spearmanr",
            "kendalltau",
        )
        s, g, u, f, cap = self.eval_dims
        batch, feats = pack_eval(records, s, g, u, f)
        batch = jax.device_put(batch)
        feats = jax.device_put(feats)
        mask = (np.arange(s)[None, :] < np.asarray(batch.n_steps)[:, None]).astype(
            np.float32
        )
        mask = jax.device_put(mask)
        apply_fn = self.spec.module.apply
        hp = self.hp

        if use_device:
            eval_program = self._device_eval_program()

            def run(params, rng):
                c, a, m = eval_program(params, rng, feats, mask, batch)
                return float(c), float(a), float(m)

            return run

        # Host-oracle path: device forward, numpy eval (exact reference arith).
        forward = getattr(self, "_eval_forward", None)
        if forward is None:

            @jax.jit
            def forward(params, rng, feats, mask):
                return apply_fn(params, feats, mask, rng=rng, train=False, hp=hp)

            self._eval_forward = forward

        def run(params, rng):
            scores = np.asarray(forward(params, rng, feats, mask))
            corrs, af1s, mf1s = [], [], []
            for i, r in enumerate(records):
                probs = scores[i, : r.n_steps]
                ms = eval_np.generate_scores(probs, r.n_frames, r.picks)
                corrs.append(eval_np.evaluate_scores(ms, r.user_scores, corr_metric))
                summ = eval_np.generate_summary(
                    probs, r.change_points, r.n_frames, r.n_frame_per_seg, r.picks, prop, method
                )
                a, mx = eval_np.evaluate_summary(summ, r.user_summary)
                af1s.append(a)
                mf1s.append(mx)
            return float(np.mean(corrs)), float(np.mean(af1s)), float(np.mean(mf1s))

        return run

    # ----------------------------------------------------------------- hooks
    def compute_policy(self):
        """Recurrent-matmul streaming policy context.

        ``--bf16 1`` halves the HBM weight streaming that bounds batch-1 RNN
        steps (BENCH_NOTES.md); ``--int8 1`` additionally streams the lean-
        LSTM recurrent weights as per-channel int8 (half again, straight-
        through grads — an opt-in perf mode, see nn/quant.py) and implies
        bf16 for the rest of the recurrent math."""
        import contextlib

        ctx = contextlib.ExitStack()
        if int(getattr(self.hps, "data_parallel", 0) or 0) > 1:
            # GSPMD cannot partition a pallas_call custom-call over the dp
            # mesh; keep the (shardable) XLA scans when videos are sharded
            # across devices.
            from summarizer_tpu.nn.rnn_pallas import force_pallas_rnn

            ctx.enter_context(force_pallas_rnn(False))
        use_int8 = int(self.hp.get("int8", 0))
        if use_int8 or int(self.hp.get("bf16", 0)):
            from summarizer_tpu.nn.policy import rnn_compute

            ctx.enter_context(rnn_compute(jnp.bfloat16))
            if use_int8:
                from summarizer_tpu.nn.quant import rnn_int8_streaming

                ctx.enter_context(rnn_int8_streaming())
        return ctx

    def init_params(self, rng):
        return self.spec.module.init(rng, self.hp)

    def train_fold(self, fold: int, split: dict) -> FoldResult:
        raise NotImplementedError

    # ----------------------------------------------------------- resume utils
    def state_path(self, fold: int) -> str:
        """Per-(dataset, fold) train-state path.  The dataset component
        matters: a multi-splits-file run (benchmark sweep) reuses the same
        log dir, and a bare ``state_fold{k}`` name would make the second
        dataset's folds resume from the first's checkpoints."""
        import os

        return getattr(self.hps, "resume_path", None) or os.path.join(
            self.hps.log_path, f"state_{self.dataset_name}_fold{fold}.ckpt"
        )

    def maybe_save_state(self, path, state, min_interval_s: float = 150.0,
                         force: bool = False):
        """Save train state for crash recovery, wall-gated: GAN states are
        multi-GB (3 Adam chains over ~190M params), so saving at every test
        epoch costs more than the training it protects.  The gate adapts:
        a save is also skipped while the *measured* cost of the last save
        exceeds a third of the wall since then (the tunnel fetch of a 2.3 GB
        GAN state can take minutes; crash recovery must not cost more than
        the training it insures)."""
        import logging
        import threading
        import time as _time

        now = _time.monotonic()
        last = getattr(self, "_last_state_save", 0.0)
        cost = getattr(self, "_last_state_save_cost", 0.0)
        prior = getattr(self, "_save_thread", None)
        if prior is not None and prior.is_alive():
            if not force:
                return  # previous snapshot still being written
            prior.join()  # forced saves must land (fold-end state)
        if not force and now - last < max(min_interval_s, 3.0 * cost):
            return
        from summarizer_tpu.train.resume import save_state

        light = bool(int(self.hp.get("resume_light", 0)))

        def _do():
            t0 = _time.monotonic()
            save_state(path, state, light=light)
            self._last_state_save_cost = _time.monotonic() - t0
            if self._last_state_save_cost > 10.0:
                logging.info(
                    f"state save took {self._last_state_save_cost:.0f}s ({path})"
                )

        self._last_state_save = now
        if force:
            # Synchronous: the caller is about to finish the fold (or the
            # process); the state must be on disk when it returns.
            _do()
            self._save_thread = None
        else:
            # Asynchronous: the device_get of a multi-GB GAN state over the
            # tunnel takes minutes; overlap it with the next epochs.  jax
            # arrays are immutable, so the snapshot is consistent, and the
            # .tmp + os.replace in save_state keeps a crash from leaving a
            # torn file.
            th = threading.Thread(target=_do, daemon=True)
            th.start()
            self._save_thread = th

    def heartbeat(self):
        """Touch ``<log_path>/heartbeat`` from the MAIN thread at real
        progress points (fold start, resume load, epochs, evals).  The sweep
        watchdog kills children whose log dir goes quiet; phases that write
        no metrics (resume-skipping a finished fold loads gigabytes without
        logging) need this to not read as a dead-worker hang.  A thread
        would defeat the purpose: a hung device RPC blocks the main thread,
        and exactly then the touches must stop."""
        import os

        path = os.path.join(self.hps.log_path, "heartbeat")
        try:
            with open(path, "a"):
                os.utime(path)
        except OSError:
            pass

    # -------------------------------------------------------------- tb utils
    def scalar(self, fold, phase, tag, value, step):
        self.heartbeat()
        self.history.setdefault((phase, tag), []).append(float(value))
        self.writer.add_scalar(
            f"{self.dataset_name}/Fold_{fold + 1}/{phase}/{tag}", value, step
        )

    def draw_gtscores(self, fold, keys):
        """TB histograms of normalized gtscores (ref: models/__init__.py:121-132)."""
        for key in keys:
            r = self.dataset[key]
            try:
                i = int(key.split("_")[1])
            except (IndexError, ValueError):
                i = 0
            self.writer.add_histogram(
                f"{self.dataset_name}/Fold_{fold + 1}/Train/gtscores",
                r.normalized_gtscore,
                i,
            )
