"""Engine base: the fold protocol shared by all training paradigms.

Reproduces the reference Trainer contract (summarizer/models/__init__.py:9-187)
— reset per fold, train(fold) -> best (corr, avgF1, maxF1) by test correlation,
test() over the fold's test keys, predict_dataset over every video — on top of
packed device tensors and one jitted eval program per fold.
"""

from __future__ import annotations

import os
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
        # If the dataset-wide train pack is already resident on device
        # (sequential/fused training uploaded it), gather the test videos
        # from it instead of re-uploading them: at LOL scale each fold's
        # eval features are ~830 MB of tunnel traffic otherwise.
        shared = getattr(self, "_stacked_pack", None)
        if shared is not None and all(k in self._slot for k in keys):
            slots = jnp.asarray(
                np.array([self._slot[k] for k in keys], np.int32)
            )
            gather_eval = jax.jit(lambda a, i: a[i, :s])

            def get_feats():
                # Gather lazily per eval call instead of holding the test
                # slice (~400 MB at LOL scale) resident for the whole fold:
                # the gathered buffer lives only while the eval runs, when
                # the train step's transients are not in flight.
                return gather_eval(self._stacked_pack[0], slots)
        else:
            feats_dev = jax.device_put(feats)

            def get_feats():
                return feats_dev
        mask = (np.arange(s)[None, :] < np.asarray(batch.n_steps)[:, None]).astype(
            np.float32
        )
        mask = jax.device_put(mask)
        apply_fn = self.spec.module.apply
        hp = self.hp

        if use_device:
            # Split jit boundary on purpose: the model forward is its own
            # (small, model-specific) program, and the heavy eval pipeline —
            # upsample + ranks + knapsack DP scan + F1 — dispatches straight
            # into the module-level jitted evaluate_batch, whose executable
            # is MODEL-INDEPENDENT and therefore shared by every config of a
            # sweep that hits the same (shapes, statics).  Round 4's
            # north-star breakdown attributed 92 s to first-run eval
            # compiles repeated per config (BENCH_NOTES "North-star total");
            # one extra dispatch per eval costs ~0.02 ms through the tunnel.
            # The fused/vmapped fold-parallel path keeps the single pure
            # program (_device_eval_program) — there the eval is traced into
            # the CV program and cannot be shared anyway.
            prop_ = float(self.hps.summary_proportion)
            forward = getattr(self, "_eval_forward", None)
            if forward is None:

                @jax.jit
                def forward(params, rng, feats, mask):
                    return apply_fn(params, feats, mask, rng=rng, train=False,
                                    hp=hp)

                self._eval_forward = forward

            def run(params, rng):
                scores = forward(params, rng, get_feats(), mask)
                c, a, m = evaluate_batch(
                    scores, batch, proportion=prop_, method=method,
                    max_capacity=cap, out_frames=f, metric=corr_metric,
                )
                return float(c.mean()), float(a.mean()), float(m.mean())

            return run

        # Host-oracle path: device forward, numpy eval (exact reference arith).
        forward = getattr(self, "_eval_forward", None)
        if forward is None:

            @jax.jit
            def forward(params, rng, feats, mask):
                return apply_fn(params, feats, mask, rng=rng, train=False, hp=hp)

            self._eval_forward = forward

        def run(params, rng):
            scores = np.asarray(forward(params, rng, get_feats(), mask))
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

    # -------------------------------------------------- fold-parallel scaffold
    # Shared machinery for ``--fold_parallel``: engines that can train all CV
    # folds as ONE vmapped XLA program (supervised, reinforce) build it from
    # these pieces.  The reference parallelized folds by hand across ~10
    # single-GPU Colab/GCP instances (Summarizer.pdf §4.1); here the fold
    # axis rides the MXU batch dimension.
    def _fold_parallel_ready(self, splits) -> bool:
        """Common guards: folds must stack (equal sizes), no mesh parallelism
        (the stacked program owns the devices), device eval (the stacked
        eval is the vmapped device program).  --resume IS supported: the
        stacked state checkpoints as one file (_stacked_state_path)."""
        hps = self.hps
        if len(splits) < 2:
            return False
        if len({len(s["train_keys"]) for s in splits}) != 1 or len(
            {len(s["test_keys"]) for s in splits}
        ) != 1:
            self.log.info("fold_parallel: unequal fold sizes — sequential path")
            return False
        if any(
            int(getattr(hps, flag, 0) or 0) > 1
            for flag in ("data_parallel", "seq_parallel",
                         "pipeline_parallel", "expert_parallel")
        ):
            self.log.info("fold_parallel: mesh parallelism set — sequential path")
            return False
        corr_metric = str(getattr(hps, "correlation_metric", "spearmanr"))
        if not (bool(hps.eval_device) and corr_metric in ("spearmanr", "kendalltau")):
            self.log.info("fold_parallel: host-oracle eval — sequential path")
            return False
        return True

    def _full_train_pack(self):
        """Dataset-wide device train pack, uploaded once per engine (cached).

        Folds index it on device — every epoch program already gathers
        ``feats[sel]`` inside the traced computation — so a K-fold CV moves
        the features host->device once instead of K times.  Through the
        tunneled TPU link (~20 MB/s) the per-fold re-upload is a material
        share of small-model wall-clock, and at LOL-318 scale it is ~3.3 GB
        PER FOLD; it also skips rebuilding the padded host pack (a multi-GB
        memcpy) per fold."""
        cached = getattr(self, "_stacked_pack", None)
        if cached is None:
            from summarizer_tpu.data.batching import pack_train

            all_keys = list(self.dataset.videos.keys())
            pack = pack_train(self.dataset.subset(all_keys), t_max=self.t_max)
            # Opt-in bf16 residency (--pack_dtype bfloat16): at LOL scale the
            # padded f32 pack is 318 x 3200 x 1024 x 4 B ~ 4.2 GB of HBM that
            # sits under the whole run; the bf16 recurrent path casts features
            # to bf16 at every cell matmul anyway (nn/policy.py), so storing
            # the pack bf16 halves that residency.  The GAN x LOL sweep rows
            # need the headroom (DATASET_OVERRIDES); precision-sensitive f32
            # paths keep the float32 default.
            pk_dt = str(self.hp.get("pack_dtype", "float32"))
            if pk_dt not in ("float32", "bfloat16"):
                raise ValueError(f"pack_dtype must be float32|bfloat16, got {pk_dt}")
            feats_h = pack.features if pk_dt == "float32" else np.asarray(
                pack.features, dtype=jnp.bfloat16
            )
            cached = self._stacked_pack = (
                jax.device_put(feats_h),
                jax.device_put(pack.targets),
                jax.device_put(pack.mask),
            )
            self._full_lengths = pack.mask.sum(-1).astype(int)
            self._slot = {k: i for i, k in enumerate(all_keys)}
        return cached

    def _shared_train_view(self, train_keys):
        """(feats, targets, mask, slots): the shared dataset-wide pack plus
        this fold's global video slots.  Composing the fold's local
        permutation with ``slots`` reproduces the per-fold-pack training
        order exactly (same videos, same data, same RNG draws) — only the
        gather indices change."""
        feats, targets, mask = self._full_train_pack()
        slots = np.array([self._slot[k] for k in train_keys], np.int32)
        return feats, targets, mask, slots

    def _stacked_fold_data(self, splits):
        """One dataset-wide train pack shared by every fold, plus the
        (k_folds, n_train) matrix of global video slots each fold trains on —
        per-fold permutations index this shared pack instead of carrying k
        copies of the features."""
        feats, targets, mask = self._full_train_pack()
        fold_idx = jnp.asarray(
            np.array(
                [[self._slot[k] for k in s["train_keys"]] for s in splits],
                np.int32,
            )
        )
        return feats, targets, mask, fold_idx, len(self.dataset.videos)

    def _stacked_init(self, k_folds: int, fold_base: int = 0):
        """Per-fold RNG streams and stacked params with the SAME seeds/keys
        as the sequential path (PRNGKey(seed + fold) -> split -> init).
        ``fold_base`` offsets the seeds for single-fold fused runs (the
        sequential path's fold f uses seed + f)."""
        rngs = jnp.stack(
            [
                jax.random.PRNGKey(int(self.hps.seed) + fold_base + f)
                for f in range(k_folds)
            ]
        )
        ks = jax.vmap(lambda r: jax.random.split(r))(rngs)
        rngs, k_init = ks[:, 0], ks[:, 1]
        params = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[self.init_params(k_init[f]) for f in range(k_folds)],
        )
        return rngs, params

    def _stacked_eval_setup(self, splits):
        """Stacked per-fold eval packs + the vmapped device eval program.
        Eval dims are dataset-global (see __init__), so folds share shapes."""
        s_dim = self.eval_dims[0]
        packs = [
            pack_eval(
                self.dataset.subset(list(s["test_keys"])), *self.eval_dims[:4]
            )
            for s in splits
        ]
        eval_batch = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[p[0] for p in packs],
        )
        eval_feats = jnp.stack([jnp.asarray(p[1]) for p in packs])
        eval_mask = jnp.stack(
            [
                jnp.asarray(
                    (np.arange(s_dim)[None, :] < np.asarray(p[0].n_steps)[:, None])
                    .astype(np.float32)
                )
                for p in packs
            ]
        )
        eval_multi = getattr(self, "_eval_multi", None)
        if eval_multi is None:
            # One jit object per engine: repeated calls (single-fold fused
            # runs once per fold) hit the shape cache instead of re-tracing.
            eval_multi = self._eval_multi = jax.jit(
                jax.vmap(self._device_eval_program())
            )
        return eval_multi, eval_feats, eval_mask, eval_batch

    def _stacked_best_update(self, best, params, corr, af1, mf1):
        """Fold the stacked eval metrics into the per-fold FoldResults,
        snapshotting fold f's params slice when its correlation improves."""
        for f in range(len(best)):
            b = best[f]
            b.best_avg_f1 = max(b.best_avg_f1, float(af1[f]))
            b.best_max_f1 = max(b.best_max_f1, float(mf1[f]))
            if float(corr[f]) > b.best_corr:
                b.best_corr = float(corr[f])
                # Device-resident snapshot: the slice is an on-device gather;
                # pulling it through the tunnel here cost one device_get per
                # improvement per fold (~190 MB for SumGAN-att).  The single
                # pull happens at save time (train/loop.py saves the best
                # fold's weights once per splits file).
                b.best_params = jax.tree.map(lambda x: x[f], params)

    def _stacked_opt_init(self, optimizer, params, k_folds: int):
        """Stacked optimizer states.  Non-trainable zoo members (Random)
        have EMPTY param trees; vmap needs an array argument to batch over,
        so their (scalar-count) state is stacked directly instead."""
        if jax.tree.leaves(params):
            return jax.vmap(optimizer.init)(params)
        state = optimizer.init(params)
        return jax.tree.map(lambda x: jnp.stack([x] * k_folds), state)

    def _stacked_state_path(self) -> str:
        """Checkpoint path for the STACKED train state (all folds in one
        file).  Distinct from the per-fold sequential paths so switching
        --fold_parallel on/off between retries never resumes a mismatched
        pytree structure.  ``_stacked_path_tag`` (set by fold-chunked GAN
        stacking, train/adversarial.py::train_folds) keys each chunk's file
        by its fold base so a chunked retry never loads a full-stack
        pytree."""
        import os

        tag = getattr(self, "_stacked_path_tag", "")
        explicit = getattr(self.hps, "resume_path", None)
        if explicit:
            return explicit + tag
        return os.path.join(
            self.hps.log_path, f"state_{self.dataset_name}_stacked{tag}.ckpt"
        )

    def _stacked_resume_load(self, params, opt_state, rngs, extras):
        """Load a stacked checkpoint if --resume is set and one exists.
        Returns (params, opt_state, rngs, extras, start_epoch).  Like the
        sequential paths, best-by-corr tracking restarts at the resume
        point (pre-crash snapshots are gone with the process; the retry
        re-evaluates from start_epoch on)."""
        import os

        from summarizer_tpu.train.resume import TrainState, load_state

        path = self._stacked_state_path()
        if not (getattr(self.hps, "resume", False) and os.path.exists(path)):
            return params, opt_state, rngs, extras, 0
        st = load_state(
            path,
            TrainState(params=params, opt_state=opt_state, rng=rngs,
                       extras=extras),
        )
        self.log.info(f"Resumed stacked folds at epoch {st.epoch}")
        if st.light and st.epoch < int(self.hps.epochs):
            self.log.warning(
                "resumed from a params-only fold-complete record with epochs "
                "left to train: optimizer moments restart"
            )
        self.heartbeat()
        return st.params, st.opt_state, jnp.asarray(st.rng), st.extras, st.epoch

    def _stacked_maybe_save(self, params, opt_state, rngs, extras, epoch,
                            force=False, final=False):
        """Wall-gated async save of the stacked state (see maybe_save_state);
        no-op unless --resume is set."""
        if not getattr(self.hps, "resume", False):
            return
        from summarizer_tpu.train.resume import TrainState

        self.maybe_save_state(
            self._stacked_state_path(),
            TrainState(params=params, opt_state=opt_state, epoch=epoch,
                       rng=rngs, extras=extras),
            force=force, final=final,
        )

    def _fold_metrics_path(self, state_path: str) -> str:
        return state_path + ".metrics.json"

    def save_fold_metrics(self, state_path: str, best) -> None:
        """Tiny sidecar record of per-fold BEST metrics next to the state
        file.  A crashed-and-retried run resumes completed folds from the
        final-epoch params, where no eval fires and the re-reported metrics
        would come from final params rather than the best epoch; the sidecar
        lets the retry reconstruct the uninterrupted run's best-by-corr
        numbers exactly (ADVICE r3).  Best-fold WEIGHTS on that path are
        still final-epoch — recorded in BENCH_NOTES."""
        import json as _json

        if not getattr(self.hps, "resume", False):
            return  # sidecar only serves crash-retry; mirror the state gate
        rec = [[float(b.best_corr), float(b.best_avg_f1), float(b.best_max_f1)]
               for b in best]
        if any(c > -1.0 for c, _, _ in rec):
            tmp = self._fold_metrics_path(state_path) + ".tmp"
            with open(tmp, "w") as f:
                _json.dump({"best": rec}, f)
            os.replace(tmp, self._fold_metrics_path(state_path))

    def load_fold_metrics(self, state_path: str, k_folds: int):
        """The sidecar's per-fold [corr, af1, mf1] list, or None."""
        import json as _json

        try:
            with open(self._fold_metrics_path(state_path)) as f:
                rec = _json.load(f)["best"]
        except (OSError, ValueError, KeyError):
            return None
        return rec if len(rec) == k_folds else None

    def _stacked_finalize(self, best, params, rngs, eval_multi, eval_feats,
                          eval_mask, eval_batch):
        """Score the final params for folds where no eval fired
        (test_every > epochs), so every FoldResult is real."""
        if not any(b.best_params is None for b in best):
            return best
        if all(b.best_params is None and b.best_corr <= -1.0 for b in best):
            # Resume-completed run (no epoch trained, no eval fired): prefer
            # the sidecar's recorded best-epoch metrics over re-scoring the
            # final params, so a retried row matches the uninterrupted run.
            rec = self.load_fold_metrics(self._stacked_state_path(), len(best))
            if rec is not None:
                self.log.info("fold metrics restored from sidecar record")
                for f, (c, a, m) in enumerate(rec):
                    best[f].best_corr = float(c)
                    best[f].best_avg_f1 = float(a)
                    best[f].best_max_f1 = float(m)
                    best[f].best_params = jax.tree.map(lambda x: x[f], params)
                return best
        k_fin = jax.vmap(lambda r: jax.random.split(r))(rngs)[:, 1]
        corr, af1, mf1 = map(
            np.asarray,
            eval_multi(params, k_fin, eval_feats, eval_mask, eval_batch),
        )
        for f in range(len(best)):
            if best[f].best_params is None:
                best[f] = FoldResult(
                    float(corr[f]), float(af1[f]), float(mf1[f]),
                    jax.tree.map(lambda x: x[f], params),  # device-resident
                )
        return best

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
        dp_n = int(getattr(self.hps, "data_parallel", 0) or 0)
        if dp_n > 1:
            # GSPMD cannot partition a pallas_call custom-call, but the RNN
            # kernels are batch-independent: run them shard_map'ed over the
            # dp axis so multi-chip GAN training keeps the persistent-weight
            # scans (VERDICT r2 item 6).  Batches that dp does not divide
            # fall back to the XLA scan inside rnn_lean._pallas_path.
            from summarizer_tpu.nn.rnn_pallas import shard_rnn_over
            from summarizer_tpu.parallel.mesh import make_mesh

            ctx.enter_context(shard_rnn_over(make_mesh(dp_n, dp=dp_n, tp=1), "dp"))
        use_int8 = int(self.hp.get("int8", 0))
        if use_int8 or int(self.hp.get("bf16", 0)):
            from summarizer_tpu.nn.policy import rnn_compute

            ctx.enter_context(rnn_compute(jnp.bfloat16))
            if use_int8:
                from summarizer_tpu.nn.quant import rnn_int8_streaming

                ctx.enter_context(rnn_int8_streaming())
        return ctx

    def init_params(self, rng):
        params = self.spec.module.init(rng, self.hp)
        path = getattr(self.hps, "init_weights", None)
        if path:
            # Warm start (--init-weights): every fold begins from the given
            # checkpoint — e.g. a reference-trained .pth brought across with
            # cli.import_weights — instead of a fresh random init.  The
            # random init above serves as the structure/shape template, so a
            # mismatched architecture fails loudly here.
            from summarizer_tpu.train.checkpoint import load_params

            params = load_params(str(path), params)
        return params

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
                         force: bool = False, final: bool = False):
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

        if not final and not int(self.hp.get("resume_mid_fold", 1)):
            # --param resume_mid_fold=0 (benchmark sweep): skip every
            # crash-protection save that is not a fold-COMPLETE record.
            # A retried fold replays the same RNG stream from fold start,
            # so fold-granularity recovery is bit-exact; what it trades is
            # re-training the crashed fold (~minutes) against the GUARANTEED
            # per-fold cost of pulling a multi-GB state through the 20 MB/s
            # tunnel (~2 min each for post-pretrain + gated mid-fold saves).
            # For short sweep folds the insurance costs more than the risk.
            return

        now = _time.monotonic()
        last = getattr(self, "_last_state_save", None)
        if last is None and not force:
            # First gated call starts the interval clock instead of saving:
            # it used to fire a multi-GB state fetch ~1 min into every GAN
            # fold — peak tunnel load, the observed worker-killer — to
            # protect only the first couple of epochs (the forced post-
            # pretrain snapshot already covers everything before them).
            self._last_state_save = now
            return
        last = last or 0.0
        cost = getattr(self, "_last_state_save_cost", 0.0)
        prior = getattr(self, "_save_thread", None)
        if prior is not None and prior.is_alive():
            if not force:
                return  # previous snapshot still being written
            prior.join()  # forced saves must land (fold-end state)
        if not force and now - last < max(min_interval_s, 3.0 * cost):
            return
        from summarizer_tpu.train.resume import (save_state,
                                                 save_state_sharded,
                                                 state_nbytes)

        if int(self.hp.get("resume_light", 0)) and not getattr(
            self, "_warned_resume_light", False
        ):
            # resume_light used to drop the Adam moments from the payload; a
            # resumed fold restarted its optimizer dynamics.  Sharded full-
            # state saves (VERDICT r2 item 8) stream the moments per
            # component instead, so resume is strict-parity at similar cost.
            self._warned_resume_light = True
            logging.warning("--resume_light is deprecated and ignored: "
                            "full state is saved sharded (strict resume)")
        shard_mb = float(self.hp.get("resume_shard_mb", 64))
        sharded = state_nbytes(state) > shard_mb * 2**20

        # ``final`` marks a fold-COMPLETE record (epoch == hps.epochs): a
        # retry only needs it to skip the fold, so with the opt-in
        # ``resume_final_light`` (set by the benchmark sweep, whose retries
        # never extend epochs) it drops the Adam moments — 2/3 of a GAN's
        # 2.2 GB state through the 20 MB/s tunnel device_get.  The default
        # keeps FULL state so a completed run resumed with a larger epoch
        # budget continues with exact moments (strict resume).
        light = final and bool(int(self.hp.get("resume_final_light", 0)))

        def _do():
            t0 = _time.monotonic()
            if light:
                save_state(path, state, light=True)
            else:
                (save_state_sharded if sharded else save_state)(path, state)
            self._last_state_save_cost = _time.monotonic() - t0
            if self._last_state_save_cost > 10.0:
                logging.info(
                    f"state save took {self._last_state_save_cost:.0f}s ({path})"
                )

        self._last_state_save = now
        # ALL saves are asynchronous: the device_get of a multi-GB GAN state
        # over the tunnel takes minutes; a synchronous fold-end save stalled
        # every GAN fold ~2 min.  jax arrays are immutable, so the snapshot
        # is consistent; .tmp + os.replace keeps a crash from leaving a torn
        # file; and train/loop.py calls flush_saves() before reporting a
        # splits file, so states are durable before a BENCHROW is emitted.
        # Forced saves first join the previous in-flight save (same path —
        # ordering matters), which by fold end has long since landed.
        th = threading.Thread(target=_do, daemon=True)
        th.start()
        self._save_thread = th
        if int(self.hp.get("save_sync", 0)):
            # --param save_sync=1 (HBM-marginal configs, e.g. the GAN x LOL
            # sweep at batch 4): an ASYNC save pins the snapshotted device
            # state (params + 3 Adam chains, ~2.3 GB) while the next epoch
            # allocates its own — exactly the margin the batch bisection
            # left.  Joining trades ~save-cost seconds of wall for zero
            # HBM overlap.
            th.join()
        if not getattr(self, "_save_atexit_registered", False):
            # Durability without relying on every caller to flush_saves():
            # the save thread is a daemon (a hung tunnel device_get must not
            # wedge interpreter exit forever), so a direct train_fold caller
            # that exits right after a forced save would otherwise lose the
            # fold-complete checkpoint.  The bounded join covers the normal
            # case; a save still in flight after 300 s is a dead worker.
            import atexit

            def _final_flush():
                t = getattr(self, "_save_thread", None)
                if t is not None and t.is_alive():
                    t.join(timeout=300.0)
                    if t.is_alive():
                        logging.warning(
                            "state save still in flight at exit (>300s); "
                            "checkpoint may be the previous complete one"
                        )

            atexit.register(_final_flush)
            self._save_atexit_registered = True

    def flush_saves(self):
        """Join any in-flight async state save (loop.py calls this at the
        end of each splits file, before results are reported)."""
        th = getattr(self, "_save_thread", None)
        if th is not None and th.is_alive():
            th.join()

    def heartbeat(self, where: str = ""):
        """Touch ``<log_path>/heartbeat`` from the MAIN thread at real
        progress points (fold start, resume load, epochs, evals).  The sweep
        watchdog kills children whose log dir goes quiet; phases that write
        no metrics (resume-skipping a finished fold loads gigabytes without
        logging) need this to not read as a dead-worker hang.  A thread
        would defeat the purpose: a hung device RPC blocks the main thread,
        and exactly then the touches must stop.

        ``where`` (optional) is written INTO the file: when a worker abort is
        deterministic (QUIRKS.md, the (20, 648) SumGAN program), the last
        payload names the exact program shape that killed it — the bisection
        that took a day in round 3 becomes one crash + one read."""
        import os

        path = os.path.join(self.hps.log_path, "heartbeat")
        try:
            if where:
                with open(path, "w") as f:
                    f.write(where)
            else:
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
