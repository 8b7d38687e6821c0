"""Supervised MSE engine (random / logistic / vasnet / transformer).

The reference's hot loop — shuffle keys, per-video forward/MSE/backward/Adam
step (summarizer/models/logistic.py:61-89) — becomes ONE compiled XLA program
per epoch: a ``lax.scan`` over shuffled, padded videos whose carry is
(params, opt_state).  ``batch_size=1`` preserves the reference's exact
batch-1 dynamics (one optimizer step per video, per-video min-max targets,
per-video loss means); larger batch sizes take one step per video *group*
with the per-video masked means averaged, and shard over the device mesh in
the data-parallel path (parallel/data_parallel.py).
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from summarizer_tpu.train.engine import Engine, FoldResult
from summarizer_tpu.train.optim import torch_adam
from summarizer_tpu.utils.profiling import StepTimer, trace


def masked_mse(scores, targets, mask):
    """Per-video mean over valid steps, then mean over the (micro)batch —
    keeps each video's loss weight equal regardless of its length, matching
    per-video nn.MSELoss means in the reference."""
    se = ((scores - targets) * mask) ** 2
    per_video = se.sum(-1) / jnp.maximum(mask.sum(-1), 1.0)
    return per_video.mean()


def make_epoch_impl(apply_fn, hp, optimizer, trainable: bool, batch_size: int,
                    mesh=None, batch_spec=None):
    """Build the (unjitted) epoch program: scan over video groups.
    ``make_epoch_fn`` jits it; fold-parallel training vmaps it over a
    stacked fold axis first (train_folds below).

    With ``mesh``, each group's video axis is shard-constrained over the
    ``dp`` mesh axis: the per-device microbatch computes locally and XLA
    emits the gradient psum over ICI (params stay replicated).
    ``batch_spec`` overrides the constraint — e.g. P("dp", "sp") on a
    2-D mesh additionally lays the time axis over ``sp`` so the
    sequence-parallel apply receives activations already sharded."""

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert batch_size % mesh.shape["dp"] == 0, (
            f"batch_size {batch_size} must divide over dp={mesh.shape['dp']}"
        )
        dp_sharding = NamedSharding(mesh, batch_spec or P("dp"))

    def loss_fn(params, x, t, m, rng):
        out = apply_fn(params, x, m, rng=rng, train=True, hp=hp)
        if isinstance(out, tuple):  # (scores, extra-loss), e.g. MoE router aux
            scores, extra = out
            return masked_mse(scores, t, m) + extra
        return masked_mse(out, t, m)

    def group_step(carry, inp):
        params, opt_state = carry
        x, t, m, rng = inp
        if mesh is not None:
            x = jax.lax.with_sharding_constraint(x, dp_sharding)
            t = jax.lax.with_sharding_constraint(t, dp_sharding)
            m = jax.lax.with_sharding_constraint(m, dp_sharding)
        if trainable:
            loss, grads = jax.value_and_grad(loss_fn)(params, x, t, m, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        else:
            loss = loss_fn(params, x, t, m, rng)
        return (params, opt_state), loss

    def epoch(params, opt_state, feats, targets, mask, perm, rng):
        n = perm.shape[0]
        g = n // batch_size
        sel = perm[: g * batch_size].reshape(g, batch_size)
        xs = (
            feats[sel],
            targets[sel],
            mask[sel],
            jax.random.split(rng, g),
        )
        (params, opt_state), losses = jax.lax.scan(group_step, (params, opt_state), xs)
        return params, opt_state, losses.mean()

    return epoch


def make_epoch_fn(apply_fn, hp, optimizer, trainable: bool, batch_size: int,
                  mesh=None, batch_spec=None):
    """The jitted epoch program (see make_epoch_impl)."""
    return jax.jit(
        make_epoch_impl(
            apply_fn, hp, optimizer, trainable, batch_size, mesh, batch_spec
        )
    )


def make_cv_fused(epoch_impl, eval_program, *, epochs: int, test_every: int,
                  n: int):
    """The ENTIRE fold-parallel CV run as ONE XLA program.

    The per-epoch stacked loop (train_folds below, ``--fused 0``) still pays
    one host<->device round trip per epoch (the blocking loss fetch) plus one
    per eval and a multi-MB stacked-params pull on every best-corr
    improvement; through the remote-TPU tunnel those round trips — not
    device compute — dominate small-model sweeps (~2 s each measured).  Here
    epochs become a ``lax.scan``, eval fires under ``lax.cond`` on the same
    ``epoch % test_every == 0`` cadence as the sequential path
    (summarizer/models/logistic.py:96-104 semantics), and best-by-corr
    params snapshots are on-device ``where`` selects.  One dispatch, then
    scalars + the best params cross the tunnel once.

    RNG parity: the scan body draws the identical (perm, epoch, eval) key
    streams as the per-epoch loop, so fused == non-fused bit-for-bit up to
    XLA scheduling (pinned by tests/test_fused_cv.py).
    """
    epoch_v = jax.vmap(epoch_impl, in_axes=(0, 0, None, None, None, 0, 0))
    eval_v = jax.vmap(eval_program)

    @jax.jit
    def cv_program(params, opt_state, rngs, feats, targets, mask, fold_idx,
                   eval_feats, eval_mask, eval_batch):
        k = rngs.shape[0]

        def step(carry, epoch):
            (params, opt_state, rngs, best_c, best_a, best_m,
             best_params) = carry
            ks = jax.vmap(lambda r: jax.random.split(r, 4))(rngs)
            rngs2, k_perm, k_ep, k_ev = ks[:, 0], ks[:, 1], ks[:, 2], ks[:, 3]
            perm_local = jax.vmap(
                lambda kk: jax.random.permutation(kk, n)
            )(k_perm)
            perm = jnp.take_along_axis(fold_idx, perm_local, axis=1)
            params, opt_state, loss = epoch_v(
                params, opt_state, feats, targets, mask, perm, k_ep
            )
            evaled = (epoch % test_every) == 0
            corr, af1, mf1 = jax.lax.cond(
                evaled,
                lambda _: eval_v(params, k_ev, eval_feats, eval_mask,
                                 eval_batch),
                lambda _: (jnp.full((k,), jnp.nan),) * 3,
                None,
            )
            improved = evaled & (corr > best_c)
            best_c = jnp.where(improved, corr, best_c)
            best_a = jnp.where(evaled, jnp.maximum(best_a, af1), best_a)
            best_m = jnp.where(evaled, jnp.maximum(best_m, mf1), best_m)
            best_params = jax.tree.map(
                lambda b, p: jnp.where(
                    improved.reshape((k,) + (1,) * (p.ndim - 1)), p, b
                ),
                best_params, params,
            )
            return (
                (params, opt_state, rngs2, best_c, best_a, best_m,
                 best_params),
                (loss, corr, af1, mf1),
            )

        k_arr = rngs.shape[0]
        init = (
            params, opt_state, rngs,
            jnp.full((k_arr,), -1.0, jnp.float32),
            jnp.zeros((k_arr,), jnp.float32),
            jnp.zeros((k_arr,), jnp.float32),
            params,
        )
        carry, (losses, corrs, af1s, mf1s) = jax.lax.scan(
            step, init, jnp.arange(epochs)
        )
        (params, opt_state, rngs, best_c, best_a, best_m, best_params) = carry
        return (params, opt_state, rngs, best_c, best_a, best_m, best_params,
                losses, corrs, af1s, mf1s)

    return cv_program


class SupervisedEngine(Engine):
    def train_apply_fn(self):
        """The model forward used by the epoch program.  With
        ``--seq_parallel N`` (vasnet/transformer), training activations
        shard their time axis over an N-device mesh
        (parallel/sequence_parallel.py); with ``--pipeline_parallel N``
        (transformer), the encoder stack is GPipe-staged over N devices
        (parallel/pipeline_parallel.py).  Eval keeps the standard path."""
        hps = self.hps
        sp = int(getattr(hps, "seq_parallel", 0) or 0)
        pp = int(getattr(hps, "pipeline_parallel", 0) or 0)
        extra_fn = getattr(self.spec.module, "supervised_loss_extra", None)
        if extra_fn is not None:
            # Module contributes an extra train-time loss term (MoE router
            # load-balance): route it to the epoch program; with
            # --expert_parallel N the expert banks shard over an ep mesh.
            ep = int(getattr(hps, "expert_parallel", 0) or 0)
            if ep > 1:
                from summarizer_tpu.parallel.expert_parallel import (
                    ep_expert_override,
                    make_ep_mesh,
                )

                override = ep_expert_override(make_ep_mesh(ep))

                def apply_fn(params, x, m, *, rng, train, hp):
                    return extra_fn(
                        params, x, m, rng=rng, train=train,
                        hp={**hp, "moe_override": override},
                    )

                return apply_fn
            return extra_fn
        if pp > 1:
            return self._pp_apply_fn(pp)
        if sp <= 1:
            return self.spec.module.apply
        from summarizer_tpu.parallel.sequence_parallel import (
            make_sp_mesh,
            sp_transformer_apply,
            sp_vasnet_apply,
        )

        sp_apply = {"vasnet": sp_vasnet_apply, "transformer": sp_transformer_apply}
        model = str(hps.model)
        if model not in sp_apply:
            raise ValueError(
                f"--seq_parallel supports vasnet/transformer, not {model} "
                f"(recurrent scorers are time-sequential; shard videos with "
                f"--data_parallel instead)"
            )
        dp = int(getattr(hps, "data_parallel", 0) or 0)
        if dp > 1:
            # dp x sp composition: videos over "dp", time over "sp" — halos
            # ride ICI neighbors within each dp row (sp_attention's
            # batch_axis contract).
            from jax.sharding import Mesh
            import numpy as np

            devices = jax.devices()
            assert dp * sp <= len(devices), (
                f"dp={dp} x sp={sp} needs {dp * sp} devices, have {len(devices)}"
            )
            mesh = Mesh(
                np.asarray(devices[: dp * sp]).reshape(dp, sp), ("dp", "sp")
            )
            batch_axis = "dp"
            self._parallel_mesh = mesh  # train_fold pre-shards batches on it
        else:
            mesh = make_sp_mesh(sp)
            batch_axis = None
        fn = sp_apply[model]

        def apply_fn(params, x, m, *, rng, train, hp):
            return fn(
                params, x, m, mesh=mesh, batch_axis=batch_axis,
                rng=rng, train=train, hp=hp,
            )

        return apply_fn

    def _pp_apply_fn(self, pp: int):
        """GPipe-staged transformer forward for --pipeline_parallel N."""
        import math

        hps = self.hps
        assert int(getattr(hps, "seq_parallel", 0) or 0) <= 1 and int(
            getattr(hps, "data_parallel", 0) or 0
        ) <= 1, (
            "--pipeline_parallel cannot combine with --seq_parallel/"
            "--data_parallel from the CLI: they build separate meshes (use "
            "parallel.pipeline_parallel programmatically for hybrid meshes)"
        )
        from summarizer_tpu.parallel.pipeline_parallel import (
            make_pp_mesh,
            pp_transformer_apply,
        )

        mesh = make_pp_mesh(pp)
        # One microbatch per stage when the video group divides; otherwise the
        # largest divisor of the group that fits the pipeline.
        n_micro = math.gcd(max(1, int(hps.batch_size)), pp)

        def apply_fn(params, x, m, *, rng, train, hp):
            return pp_transformer_apply(
                params, x, m, mesh=mesh, n_micro=n_micro, rng=rng,
                train=train, hp=hp,
            )

        return apply_fn

    def train_folds(self, splits: list[dict]) -> list[FoldResult] | None:
        """All CV folds trained simultaneously (``--fold_parallel``): the
        fold axis becomes a vmapped batch dimension of ONE XLA program —
        stacked params/optimizer states, per-fold permutations indexing a
        single shared dataset-wide pack, and the fold-invariant eval
        program vmapped over stacked eval packs.

        The reference parallelized folds by hand across ~10 single-GPU
        Colab/GCP instances (Summarizer.pdf §4.1); here the same axis rides
        the MXU batch dimension, which also lifts the arithmetic intensity
        of batch-1 training: K folds' per-video matmuls fuse into one
        batched contraction.  Per-fold trajectories match the sequential
        path's seeds/keys exactly up to float reassociation of the batched
        matmuls.

        Returns one FoldResult per fold, or None when this run can't stack
        (unequal fold sizes, mesh parallelism, host-oracle eval) — the
        caller falls back to the sequential per-fold path.  --resume
        checkpoints all folds as one stacked state file.
        """
        hps = self.hps
        k_folds = len(splits)
        if not self._fold_parallel_ready(splits):
            return None
        self.heartbeat()

        # Shared dataset-wide pack; folds index it with global video slots.
        feats, targets, mask, fold_idx, _ = self._stacked_fold_data(splits)
        n = fold_idx.shape[1]
        bs = max(1, int(hps.batch_size))
        assert n >= bs, f"batch_size {bs} exceeds the folds' {n} train videos"

        for fold, s in enumerate(splits):
            self.draw_gtscores(fold, list(s["train_keys"]))

        # Same per-fold seeds/keys as the sequential path.
        rngs, params = self._stacked_init(k_folds)

        optimizer = torch_adam(float(hps.lr), float(hps.weight_decay))
        epoch_multi = getattr(self, "_train_program_stacked", None)
        if epoch_multi is None:
            epoch_multi = jax.jit(
                jax.vmap(
                    make_epoch_impl(
                        self.train_apply_fn(), self.hp, optimizer,
                        self.spec.trainable, bs,
                    ),
                    in_axes=(0, 0, None, None, None, 0, 0),
                )
            )
            self._train_program_stacked = epoch_multi
        opt_state = self._stacked_opt_init(optimizer, params, k_folds)
        params, opt_state, rngs, _, start_epoch = self._stacked_resume_load(
            params, opt_state, rngs, {}
        )

        # Stacked eval packs (dims are dataset-global, so folds share shapes).
        eval_multi, eval_feats, eval_mask, eval_batch = self._stacked_eval_setup(
            splits
        )

        if int(getattr(hps, "fused", 1) or 0) and start_epoch == 0:
            return self._train_folds_fused(
                splits, params, opt_state, rngs, feats, targets, mask,
                fold_idx, optimizer, bs, eval_multi,
                eval_feats, eval_mask, eval_batch,
            )

        best = [FoldResult(-1.0, 0.0, 0.0, None) for _ in range(k_folds)]
        timer = StepTimer("epoch")
        for epoch in range(start_epoch, int(hps.epochs)):
            ks = jax.vmap(lambda r: jax.random.split(r, 4))(rngs)
            rngs, k_perm, k_ep, k_ev = ks[:, 0], ks[:, 1], ks[:, 2], ks[:, 3]
            perm_local = jax.vmap(lambda k: jax.random.permutation(k, n))(k_perm)
            perm = jnp.take_along_axis(fold_idx, perm_local, axis=1)
            with timer:
                params, opt_state, loss = epoch_multi(
                    params, opt_state, feats, targets, mask, perm, k_ep
                )
                loss = np.asarray(loss)  # blocks; keeps the timer honest
            for f in range(k_folds):
                self.scalar(f, "Train", "Loss", float(loss[f]), epoch)
            self.log.info(
                f"Epoch: {f'{epoch + 1}/{hps.epochs}':6}   Loss: "
                + "  ".join(f"{float(v):.05f}" for v in loss)
            )
            if epoch % int(hps.test_every_epochs) == 0:
                corr, af1, mf1 = map(
                    np.asarray,
                    eval_multi(params, k_ev, eval_feats, eval_mask, eval_batch),
                )
                for f in range(k_folds):
                    self.scalar(f, "Test", "Correlation", float(corr[f]), epoch)
                    self.scalar(f, "Test", "F-score_avg", float(af1[f]), epoch)
                    self.scalar(f, "Test", "F-score_max", float(mf1[f]), epoch)
                self._stacked_best_update(best, params, corr, af1, mf1)
                self._stacked_maybe_save(params, opt_state, rngs, {}, epoch + 1)
            self.heartbeat()

        if start_epoch < int(hps.epochs):
            self._stacked_maybe_save(
                params, opt_state, rngs, {}, int(hps.epochs), force=True,
                final=True,
            )
        best = self._stacked_finalize(
            best, params, rngs, eval_multi, eval_feats, eval_mask, eval_batch
        )
        self.save_fold_metrics(self._stacked_state_path(), best)
        if timer.times:
            st = timer.summary()
            self.log.debug(
                f"stacked epoch timing ({k_folds} folds/step): "
                f"mean {st['mean_s'] * 1e3:.1f} ms  p50 {st['p50_s'] * 1e3:.1f} ms"
            )
        return best

    def _train_folds_fused(self, splits, params, opt_state, rngs, feats,
                           targets, mask, fold_idx, optimizer, bs,
                           eval_multi, eval_feats, eval_mask, eval_batch,
                           fold_base: int = 0, state_path: str | None = None):
        """One-dispatch fold-parallel CV (see make_cv_fused).  Per-epoch
        losses and eval metrics come back as stacked arrays and are logged
        post-hoc, so TensorBoard output is identical to the per-epoch path.
        ``fold_base``/``state_path`` serve the single-fold sequential mode
        (train_fold): scalars log under the true fold index and the fold's
        own checkpoint path is used."""
        hps = self.hps
        k_folds = len(splits)
        n = fold_idx.shape[1]
        epochs = int(hps.epochs)
        test_every = int(hps.test_every_epochs)

        import time as _time

        cache = getattr(self, "_cv_programs", None)
        if cache is None:
            cache = self._cv_programs = {}
        cv = cache.get((k_folds, n))
        if cv is None:
            _t0 = _time.time()
            cv = make_cv_fused(
                make_epoch_impl(
                    self.train_apply_fn(), self.hp, optimizer,
                    self.spec.trainable, bs,
                ),
                self._device_eval_program(),
                epochs=epochs, test_every=test_every, n=n,
            )
            cache[(k_folds, n)] = cv
            self.log.debug(f"fused CV build: {_time.time() - _t0:.1f} s")
        self.heartbeat()
        timer = StepTimer("cv_fused")
        with timer:
            (params, opt_state, rngs, best_c, best_a, best_m, best_params,
             losses, corrs, af1s, mf1s) = cv(
                params, opt_state, rngs, feats, targets, mask, fold_idx,
                eval_feats, eval_mask, eval_batch,
            )
            # ONE blocking fetch for everything scalar-sized; the stacked
            # best params cross the tunnel once, below.
            best_c, best_a, best_m, losses, corrs, af1s, mf1s = map(
                np.asarray,
                (best_c, best_a, best_m, losses, corrs, af1s, mf1s),
            )
        self.heartbeat()
        for epoch in range(epochs):
            for f in range(k_folds):
                self.scalar(fold_base + f, "Train", "Loss",
                            float(losses[epoch, f]), epoch)
            self.log.info(
                f"Epoch: {f'{epoch + 1}/{epochs}':6}   Loss: "
                + "  ".join(f"{float(v):.05f}" for v in losses[epoch])
            )
            if epoch % test_every == 0:
                for f in range(k_folds):
                    self.scalar(fold_base + f, "Test", "Correlation",
                                float(corrs[epoch, f]), epoch)
                    self.scalar(fold_base + f, "Test", "F-score_avg",
                                float(af1s[epoch, f]), epoch)
                    self.scalar(fold_base + f, "Test", "F-score_max",
                                float(mf1s[epoch, f]), epoch)
        self.log.info(
            f"fused CV dispatch: {timer.summary()['mean_s']:.1f} s "
            f"({epochs} epochs x {k_folds} folds)"
        )
        if state_path is not None:
            if getattr(hps, "resume", False):
                from summarizer_tpu.train.resume import TrainState

                self.maybe_save_state(
                    state_path,
                    TrainState(
                        params=jax.tree.map(lambda x: x[0], params),
                        opt_state=jax.tree.map(lambda x: x[0], opt_state),
                        epoch=epochs, rng=rngs[0],
                    ),
                    force=True, final=True,
                )
        else:
            self._stacked_maybe_save(params, opt_state, rngs, {}, epochs,
                                     force=True, final=True)
        _t0 = _time.time()
        best_params = jax.device_get(best_params)
        self.log.debug(f"fused CV best-params pull: {_time.time() - _t0:.1f} s")
        best = [
            FoldResult(
                float(best_c[f]), float(best_a[f]), float(best_m[f]),
                # corr never improved past the -1 sentinel => no snapshot was
                # taken; leave None so _stacked_finalize scores final params
                # (mirrors the per-epoch path's semantics).
                None if best_c[f] <= -1.0
                else jax.tree.map(lambda x: x[f], best_params),
            )
            for f in range(k_folds)
        ]
        best = self._stacked_finalize(
            best, params, rngs, eval_multi, eval_feats, eval_mask, eval_batch
        )
        if state_path is None:
            self.save_fold_metrics(self._stacked_state_path(), best)
        else:
            self.save_fold_metrics(state_path, best)
        return best

    def _fold_fused_ready(self, fold: int) -> bool:
        """Single-fold fused eligibility: one dispatch replaces the per-epoch
        loop when nothing needs per-epoch host control — no mesh parallelism
        (those paths own their sharding/dispatch), device eval, no profiling
        (the trace wants a representative single epoch), no chunked scans
        (extra per-chunk keys change the trajectory), and no mid-run resume
        state (per-epoch checkpoints imply per-epoch dispatch)."""
        hps = self.hps
        if not int(getattr(hps, "fused", 1) or 0):
            return False
        if any(
            int(getattr(hps, flag, 0) or 0) > 1
            for flag in ("data_parallel", "seq_parallel",
                         "pipeline_parallel", "expert_parallel")
        ):
            return False
        corr_metric = str(getattr(hps, "correlation_metric", "spearmanr"))
        if not (bool(hps.eval_device) and corr_metric in ("spearmanr", "kendalltau")):
            return False
        if bool(getattr(hps, "profile", False)):
            return False
        if int(self.hp.get("scan_chunk", 0)):
            return False
        if getattr(hps, "resume", False) and os.path.exists(self.state_path(fold)):
            return False
        return True

    def _train_fold_fused(self, fold: int, split: dict) -> FoldResult:
        """Sequential fold as ONE dispatch: the stacked machinery with a
        singleton fold axis and the sequential path's seed (seed + fold), so
        the trajectory is identical to the per-epoch train_fold loop."""
        hps = self.hps
        self.heartbeat()
        self.draw_gtscores(fold, list(split["train_keys"]))
        feats, targets, mask, fold_idx, _ = self._stacked_fold_data([split])
        rngs, params = self._stacked_init(1, fold_base=fold)
        optimizer = torch_adam(float(hps.lr), float(hps.weight_decay))
        opt_state = self._stacked_opt_init(optimizer, params, 1)
        eval_multi, eval_feats, eval_mask, eval_batch = self._stacked_eval_setup(
            [split]
        )
        bs = max(1, int(hps.batch_size))
        return self._train_folds_fused(
            [split], params, opt_state, rngs, feats, targets, mask, fold_idx,
            optimizer, bs, eval_multi, eval_feats, eval_mask, eval_batch,
            fold_base=fold, state_path=self.state_path(fold),
        )[0]

    def train_fold(self, fold: int, split: dict) -> FoldResult:
        hps = self.hps
        if self._fold_fused_ready(fold):
            return self._train_fold_fused(fold, split)
        self.heartbeat()
        train_keys = list(split["train_keys"])
        test_keys = list(split["test_keys"])
        self.draw_gtscores(fold, train_keys)

        # Dataset-wide pack shared across folds (one upload per process);
        # the fold's local permutation composes with its global slots.
        feats, targets, mask, slots = self._shared_train_view(train_keys)
        slots_dev = jnp.asarray(slots)

        rng = jax.random.PRNGKey(int(hps.seed) + fold)
        rng, k_init = jax.random.split(rng)
        params = self.init_params(k_init)
        # Optimizer + epoch program are fold-invariant (optax transforms are
        # stateless; train shapes are padded to the dataset-global t_max), so
        # build them once per engine — per-fold closures would re-trace the
        # identical program every fold.
        cached = getattr(self, "_train_program", None)
        if cached is None:
            optimizer = torch_adam(float(hps.lr), float(hps.weight_decay))
            bs = max(1, int(hps.batch_size))
            apply_fn = self.train_apply_fn()  # may set _parallel_mesh (dp x sp)
            mesh = getattr(self, "_parallel_mesh", None)
            batch_spec = None
            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                batch_spec = P("dp", "sp")
            elif int(getattr(hps, "data_parallel", 0)) > 1:
                from summarizer_tpu.parallel.mesh import make_mesh

                mesh = make_mesh(
                    int(hps.data_parallel), dp=int(hps.data_parallel), tp=1
                )
            epoch_fn = make_epoch_fn(
                apply_fn, self.hp, optimizer,
                self.spec.trainable, bs, mesh, batch_spec,
            )
            self._train_program = (optimizer, epoch_fn)
        else:
            optimizer, epoch_fn = cached
        opt_state = optimizer.init(params)
        eval_fn = self.make_eval_fn(test_keys)

        # Optional mid-run resume (new capability; the reference loses all
        # progress on a crash, SURVEY.md §5).
        state_path = self.state_path(fold)
        start_epoch = 0
        if getattr(hps, "resume", False) and os.path.exists(state_path):
            from summarizer_tpu.train.resume import TrainState, load_state

            st = load_state(
                state_path, TrainState(params=params, opt_state=opt_state, rng=rng)
            )
            params, opt_state, rng = st.params, st.opt_state, jnp.asarray(st.rng)
            start_epoch = st.epoch
            self.log.info(f"Resumed fold {fold} at epoch {start_epoch}")
            if st.light and start_epoch < int(hps.epochs):
                self.log.warning(
                    "resumed from a params-only fold-complete record with "
                    "epochs left to train: optimizer moments restart"
                )
            self.heartbeat()

        best = FoldResult(-1.0, 0.0, 0.0, params)
        n = len(train_keys)
        timer = StepTimer("epoch")
        for epoch in range(start_epoch, int(hps.epochs)):
            rng, k_perm, k_ep, k_ev = jax.random.split(rng, 4)
            # Same permutation draw as the per-fold-pack path; composing
            # with the global slots only changes the gather indices.
            perm = slots_dev[jax.random.permutation(k_perm, n)]
            profiling = bool(getattr(hps, "profile", False)) and epoch == start_epoch
            ctx = (
                trace(os.path.join(hps.log_path, "profile"))
                if profiling
                else contextlib.nullcontext()
            )
            chunk = int(self.hp.get("scan_chunk", 0)) or n
            with ctx, timer:
                if chunk >= n:
                    params, opt_state, loss = epoch_fn(
                        params, opt_state, feats, targets, mask, perm, k_ep
                    )
                    loss = float(loss)  # blocks; keeps the timer honest
                else:
                    # Chunked execution for very large folds (see
                    # train/adversarial.py); same compiled program per chunk.
                    total = 0.0
                    for lo in range(0, n - n % chunk, chunk):
                        rng, k_c = jax.random.split(rng)
                        params, opt_state, loss_c = epoch_fn(
                            params, opt_state, feats, targets, mask,
                            perm[lo : lo + chunk], k_c,
                        )
                        total += float(loss_c) * chunk
                    if n % chunk:
                        rng, k_c = jax.random.split(rng)
                        params, opt_state, loss_c = epoch_fn(
                            params, opt_state, feats, targets, mask,
                            perm[n - n % chunk :], k_c,
                        )
                        total += float(loss_c) * (n % chunk)
                    loss = total / n
            self.log.info(
                f"Epoch: {f'{epoch + 1}/{hps.epochs}':6}   Loss: {loss:.05f}"
            )
            self.scalar(fold, "Train", "Loss", loss, epoch)

            if epoch % int(hps.test_every_epochs) == 0:
                corr, af1, mf1 = eval_fn(params, k_ev)
                self.scalar(fold, "Test", "Correlation", corr, epoch)
                self.scalar(fold, "Test", "F-score_avg", af1, epoch)
                self.scalar(fold, "Test", "F-score_max", mf1, epoch)
                best.best_avg_f1 = max(best.best_avg_f1, af1)
                best.best_max_f1 = max(best.best_max_f1, mf1)
                if corr > best.best_corr:
                    best.best_corr = corr
                    best.best_params = params  # device-resident; pulled once at save
                if getattr(hps, "resume", False):
                    from summarizer_tpu.train.resume import TrainState

                    self.maybe_save_state(
                        state_path,
                        TrainState(params=params, opt_state=opt_state, epoch=epoch + 1, rng=rng),
                    )
        if getattr(hps, "resume", False) and start_epoch < int(hps.epochs):
            # Fold-end save so resumed runs skip finished folds (see
            # adversarial.py — the wall-gated saves can be epochs stale).
            from summarizer_tpu.train.resume import TrainState

            self.maybe_save_state(
                state_path,
                TrainState(params=params, opt_state=opt_state,
                           epoch=int(hps.epochs), rng=rng),
                force=True, final=True,
            )

        if timer.times:
            s = timer.summary()
            self.log.debug(
                f"epoch timing: mean {s['mean_s'] * 1e3:.1f} ms  "
                f"p50 {s['p50_s'] * 1e3:.1f} ms  p95 {s['p95_s'] * 1e3:.1f} ms"
            )
        if best.best_corr == -1.0 and best.best_max_f1 == 0.0:
            # No eval fired this run (e.g. a --resume retry landed at/past the
            # final epoch): prefer the sidecar's recorded best-epoch metrics
            # (written by the uninterrupted portion) so the retried fold
            # reports identically; fall back to scoring the current params.
            rec = self.load_fold_metrics(state_path, 1)
            if rec is not None:
                self.log.info("fold metrics restored from sidecar record")
                best = FoldResult(rec[0][0], rec[0][1], rec[0][2],
                                  jax.device_get(params))
            else:
                rng, k_fin = jax.random.split(rng)
                corr, af1, mf1 = eval_fn(params, k_fin)
                best = FoldResult(corr, af1, mf1, jax.device_get(params))
        else:
            self.save_fold_metrics(state_path, [best])
        return best
