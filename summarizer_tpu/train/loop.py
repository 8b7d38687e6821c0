"""The cross-validation experiment driver.

Equivalent of summarizer/main.py:10-72: for each split file, train every
fold, keep the best-by-correlation weights across folds, report CV means,
log hparams, and run full-dataset prediction with the best weights.
"""

from __future__ import annotations

import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from summarizer_tpu.data.hdf5 import SummarizerDataset
from summarizer_tpu.ops import eval_np
from summarizer_tpu.train.checkpoint import load_params, save_params
from summarizer_tpu.train.engine import Engine


def make_engine(hps, dataset, dataset_name) -> Engine:
    spec = hps.model_spec
    if spec.engine == "supervised":
        from summarizer_tpu.train.supervised import SupervisedEngine

        return SupervisedEngine(spec, hps, dataset, dataset_name)
    if spec.engine == "reinforce":
        from summarizer_tpu.train.reinforce import ReinforceEngine

        return ReinforceEngine(spec, hps, dataset, dataset_name)
    if spec.engine == "sumgan":
        from summarizer_tpu.train.adversarial import SumGANEngine

        return SumGANEngine(spec, hps, dataset, dataset_name)
    if spec.engine == "sumgan_att":
        from summarizer_tpu.train.adversarial import SumGANAttEngine

        return SumGANAttEngine(spec, hps, dataset, dataset_name)
    raise KeyError(f"Unknown engine {spec.engine}")


def predict_dataset(engine: Engine, params, pred_path: str, chunk: int = 16):
    """Forward every video in the dataset with the given params and write the
    predictions h5 (layout parity: summarizer/models/__init__.py:142-177 —
    one group per dataset file, per-video scores / user_summary /
    machine_summary / machine_scores)."""
    hps = engine.hps
    dataset = engine.dataset
    keys = dataset.keys()
    prop = float(hps.summary_proportion)
    method = str(hps.selection_algorithm)
    apply_fn = engine.spec.module.apply
    hp = engine.hp

    # Reuse the eval pass's already-compiled test-mode forward when the
    # sequential device-eval path built one (engine._eval_forward, shape
    # (g, t_max)): predicting in chunks of the SAME g makes prediction a
    # pure cache hit — no new executable to compile or upload through the
    # tunnel per config (round-4 north-star breakdown charged ~74 s to the
    # predict phase; the Transformer alone paid 41 s on tvsum).
    shared_fwd = getattr(engine, "_eval_forward", None)
    if shared_fwd is not None:
        chunk = int(engine.eval_dims[1])

        def forward(params, feats, mask, rng):
            return shared_fwd(params, rng, feats, mask)
    else:

        @jax.jit
        def forward(params, feats, mask, rng):
            return apply_fn(params, feats, mask, rng=rng, train=False, hp=hp)

    os.makedirs(os.path.dirname(pred_path) or ".", exist_ok=True)
    # One padded shape for every chunk -> one compiled forward program.
    s = engine.t_max
    d = next(iter(dataset.videos.values())).features.shape[1]
    with h5py.File(pred_path, "w") as f:
        g = f.create_group(os.path.basename(dataset.path))
        rng = jax.random.PRNGKey(int(hps.seed))
        # Reuse the dataset-wide device pack when training already uploaded
        # it (engine._full_train_pack): prediction then gathers on device
        # instead of re-sending every video through the tunnel.
        shared = getattr(engine, "_stacked_pack", None)
        slot = getattr(engine, "_slot", {})
        # One jit instance hoisted out of the loop: a fresh lambda per chunk
        # would miss jax's by-identity trace cache and re-trace every chunk.
        gather_chunk = jax.jit(lambda a, i: a[i, :s])
        for lo in range(0, len(keys), chunk):
            batch_keys = keys[lo : lo + chunk]
            records = dataset.subset(batch_keys)
            if shared is not None and all(k in slot for k in batch_keys):
                idx = np.full(chunk, slot[batch_keys[0]], np.int32)
                idx[: len(batch_keys)] = [slot[k] for k in batch_keys]
                feats = gather_chunk(shared[0], jnp.asarray(idx))
            else:
                feats = np.zeros((chunk, s, d), np.float32)
                for i, r in enumerate(records):
                    feats[i, : r.n_steps] = r.features
            lens = np.zeros(chunk, np.int64)
            lens[: len(records)] = [r.n_steps for r in records]
            mask = (np.arange(s)[None, :] < lens[:, None]).astype(np.float32)
            rng, k = jax.random.split(rng)
            scores = np.asarray(forward(params, feats, mask, k))
            for i, r in enumerate(records):
                probs = scores[i, : r.n_steps]
                machine_summary = eval_np.generate_summary(
                    probs, r.change_points, r.n_frames, r.n_frame_per_seg, r.picks, prop, method
                )
                machine_scores = eval_np.generate_scores(probs, r.n_frames, r.picks)
                kgrp = g.create_group(r.key)
                kgrp.create_dataset("scores", data=probs)
                kgrp.create_dataset("user_summary", data=r.user_summary)
                kgrp.create_dataset("machine_summary", data=machine_summary)
                kgrp.create_dataset("machine_scores", data=machine_scores)


def train(hps):
    """Train across all split files; returns [(splits_file, corr, avg, max)]
    (ref: summarizer/main.py:10-72)."""
    import time as _time

    results = []
    for sf in hps.splits_files:
        hps.logger.info(f"Start training on {sf}")
        _t0 = _time.perf_counter()
        dataset = SummarizerDataset(hps.dataset_of_file[sf])
        dataset_name = hps.dataset_name_of_file[sf]
        engine = make_engine(hps, dataset, dataset_name)
        folds = hps.splits_of_file[sf]
        _t_setup = _time.perf_counter()

        weights_path = hps.weights_path[sf]
        corrs, af1s, mf1s = [], [], []
        corr_max = -1.0
        best_fold_params = None
        # --fold_parallel: all folds as one vmapped program (supervised
        # engines; falls back to the sequential path when it can't stack).
        fold_results = None
        if int(getattr(hps, "fold_parallel", 0) or 0) and hasattr(
            engine, "train_folds"
        ):
            with engine.compute_policy():
                fold_results = engine.train_folds(folds)
            if fold_results is not None:
                hps.logger.info(
                    f"File: {sf}   {len(folds)} folds trained fold-parallel "
                    f"(one vmapped program)"
                )
        for fold, split in enumerate(folds):
            if fold_results is not None:
                res = fold_results[fold]
            else:
                with engine.compute_policy():
                    res = engine.train_fold(fold, split)
            corrs.append(res.best_corr)
            af1s.append(res.best_avg_f1)
            mf1s.append(res.best_max_f1)
            if res.best_corr > corr_max:
                corr_max = res.best_corr
                # Defer the weights write to after the fold loop: best_params
                # may be a device-resident snapshot (GAN params are ~760 MB;
                # the 20 MB/s tunnel device_get must happen once per splits
                # file, not once per improved fold).  Exception: a LARGE
                # snapshot that must survive further folds' training is
                # pulled to host now — the worker's usable HBM is variable
                # (QUIRKS.md) and a held 760 MB copy has OOM'd previously-
                # fitting programs; the pull only fires when a later fold
                # still trains, so the common last-fold-improves case keeps
                # the single deferred fetch.
                best_fold_params = res.best_params
                if (
                    best_fold_params is not None
                    and fold + 1 < len(folds)
                    and fold_results is None
                    and sum(
                        getattr(x, "nbytes", 0)
                        for x in jax.tree.leaves(best_fold_params)
                        if hasattr(x, "devices")
                    ) > 256 * 2**20
                ):
                    best_fold_params = jax.device_get(best_fold_params)
            hps.logger.info(
                f"File: {sf}   Fold: {fold + 1}/{len(folds)}   "
                f"Corr: {res.best_corr: 0.5f}  "
                f"Avg F-score: {res.best_avg_f1:0.5f}  "
                f"Max F-score: {res.best_max_f1:0.5f}"
            )

        if best_fold_params is not None:
            save_params(weights_path, best_fold_params)
        engine.flush_saves()  # async state saves land before results report
        _t_train = _time.perf_counter()
        hps.logger.info(
            f"File: {sf}   Cross-validation Corr: {np.mean(corrs): 0.5f}  "
            f"Avg F-score: {np.mean(af1s):0.5f}  Max F-score: {np.mean(mf1s):0.5f}"
        )
        hps.logger.info(f"File: {sf}   Best weights: {weights_path}")

        # TB hparams. The reference accidentally overwrites metric_dict twice
        # (main.py:56-58), keeping only max-F folds; fixed here: all three
        # metric families are reported.
        hparams = hps.get_full_hps_dict()
        hparams["dataset"] = dataset_name
        metrics = {}
        for fam, vals in (
            ("Correlation", corrs),
            ("F-score_avg", af1s),
            ("F-score_max", mf1s),
        ):
            for i, v in enumerate(vals):
                metrics[f"{fam}/Fold_{i + 1}"] = float(v)
            metrics[f"{fam}/CV_Average"] = float(np.mean(vals))
        hps.writer.add_hparams(hparams, metrics)

        # Full-dataset prediction with the best weights (main.py:64-67).
        template = engine.init_params(jax.random.PRNGKey(0))
        best_params = load_params(weights_path, template)
        predict_dataset(engine, best_params, hps.pred_path[sf])
        hps.logger.info(f"File: {sf}   Machine predictions: {hps.pred_path[sf]}")
        _t_pred = _time.perf_counter()
        hps.logger.info(
            f"File: {sf}   phase walls: setup {_t_setup - _t0:.1f}s  "
            f"train+eval {_t_train - _t_setup:.1f}s  "
            f"predict {_t_pred - _t_train:.1f}s"
        )
        # Benchmark sweeps run with log_level=error; stash the phase walls so
        # the sweep can attribute per-row wall-clock without fold-level spam.
        if not hasattr(hps, "_phase_walls"):
            hps._phase_walls = {}
        hps._phase_walls[sf] = (
            _t_setup - _t0, _t_train - _t_setup, _t_pred - _t_train,
        )

        results.append((sf, float(np.mean(corrs)), float(np.mean(af1s)), float(np.mean(mf1s))))
    return results
