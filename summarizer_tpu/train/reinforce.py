"""REINFORCE engine for DSN (diversity-representativeness reward).

Ref: summarizer/models/dsn.py:49-236.  Per video: Bernoulli(probs) actions
over ``num_episodes`` episodes, reward = 0.5 * (diversity +
representativeness) with a temporal-distance cutoff, policy-gradient loss
``-E[logpi * (R - b)]`` with a per-video EMA baseline (0.9/0.1), a length
regularizer ``beta * (mean(p) - eps)^2``, optional supervised BCE, and
grad-norm clip 5.0 before Adam.

TPU shape: episodes are vmapped (one batched O(T^2) reward evaluation);
the similarity/distance matrices are hoisted out of the episode loop (they
depend only on the input, which the reference recomputes per episode); the
whole epoch is one ``lax.scan`` carrying (params, opt_state, baselines).

Quirk policy: the reference truncates ``beta = int(0.01) = 0`` (dsn.py:52),
silently disabling the length regularizer.  Default here is the intended
float 0.01; set extra param ``compat_beta_int=1`` to reproduce the bug.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from summarizer_tpu.train.engine import Engine, FoldResult
from summarizer_tpu.train.optim import torch_adam


def bce_masked(p, y, mask):
    """torch nn.BCELoss semantics (mean, log clamped at -100)."""
    logp = jnp.maximum(jnp.log(jnp.maximum(p, 1e-38)), -100.0)
    log1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 1e-38)), -100.0)
    ll = y * logp + (1.0 - y) * log1p
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def compute_reward(x, actions, mask, far_sim: bool, temp_dist_thre: int):
    """Diversity + representativeness reward for one video (dsn.py:185-236).

    x: (T, D) features, actions: (T,) binary picks, mask: (T,) validity.
    """
    picks = actions * mask
    n_picks = picks.sum()

    # Diversity: mean pairwise cosine dissimilarity among picked frames,
    # with far-apart pairs (|i-j| > thre) treated as fully dissimilar.
    normed = x * jax.lax.rsqrt(jnp.maximum((x * x).sum(-1, keepdims=True), 1e-12))
    dissim = 1.0 - normed @ normed.T
    if not far_sim:
        t = x.shape[0]
        ij = np.arange(t)
        far = np.abs(ij[:, None] - ij[None, :]) > temp_dist_thre
        dissim = jnp.where(far, 1.0, dissim)
    pair_w = picks[:, None] * picks[None, :] * (1.0 - np.eye(x.shape[0], dtype=np.float32))
    r_div = jnp.where(
        n_picks > 1, (dissim * pair_w).sum() / jnp.maximum(n_picks * (n_picks - 1.0), 1.0), 0.0
    )

    # Representativeness: exp(-mean over frames of min sq-dist to a pick).
    sq = (x * x).sum(-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d2_to_picks = jnp.where(picks[None, :] > 0, d2, jnp.inf)
    min_d2 = jnp.min(d2_to_picks, axis=1)
    mean_min = jnp.where(
        n_picks > 0, (jnp.where(mask > 0, min_d2, 0.0)).sum() / jnp.maximum(mask.sum(), 1.0), 0.0
    )
    r_rep = jnp.exp(-mean_min)

    return jnp.where(n_picks == 0, 0.0, 0.5 * (r_div + r_rep))


def make_cv_fused_rl(epoch_impl, eval_program, *, epochs: int, test_every: int,
                     n: int):
    """The ENTIRE fold-parallel REINFORCE CV run as ONE XLA program — the
    RL twin of train/supervised.py::make_cv_fused (see its docstring for the
    tunnel round-trip rationale).  Differences: the scan carry additionally
    threads the per-video EMA reward baselines, the epoch program also
    returns the mean episode reward, and the key stream reproduces the
    per-epoch stacked loop exactly (split(rng, 4) for perm/eval, then one
    more split for the chunk key — train_folds' one-chunk-per-epoch
    cadence)."""
    epoch_v = jax.vmap(epoch_impl, in_axes=(0, 0, 0, None, None, None, 0, 0))
    eval_v = jax.vmap(eval_program)

    @jax.jit
    def cv_program(params, opt_state, baselines, rngs, feats, targets, mask,
                   fold_idx, eval_feats, eval_mask, eval_batch):
        k = rngs.shape[0]

        def step(carry, epoch):
            (params, opt_state, baselines, rngs, best_c, best_a, best_m,
             best_params) = carry
            ks = jax.vmap(lambda r: jax.random.split(r, 4))(rngs)
            rngs, k_perm, k_ev = ks[:, 0], ks[:, 1], ks[:, 3]
            ks2 = jax.vmap(lambda r: jax.random.split(r))(rngs)
            rngs2, k_c = ks2[:, 0], ks2[:, 1]
            perm_local = jax.vmap(
                lambda kk: jax.random.permutation(kk, n)
            )(k_perm)
            perm = jnp.take_along_axis(fold_idx, perm_local, axis=1)
            params, opt_state, baselines, loss, reward = epoch_v(
                params, opt_state, baselines, feats, targets, mask, perm, k_c
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
                (params, opt_state, baselines, rngs2, best_c, best_a, best_m,
                 best_params),
                (loss, reward, corr, af1, mf1),
            )

        init = (
            params, opt_state, baselines, rngs,
            jnp.full((k,), -1.0, jnp.float32),
            jnp.zeros((k,), jnp.float32),
            jnp.zeros((k,), jnp.float32),
            params,
        )
        carry, (losses, rewards, corrs, af1s, mf1s) = jax.lax.scan(
            step, init, jnp.arange(epochs)
        )
        (params, opt_state, baselines, rngs, best_c, best_a, best_m,
         best_params) = carry
        return (params, opt_state, baselines, rngs, best_c, best_a, best_m,
                best_params, losses, rewards, corrs, af1s, mf1s)

    return cv_program


class ReinforceEngine(Engine):
    def _cfg(self):
        hp = self.hp
        compat = bool(int(hp.get("compat_beta_int", 0)))
        beta = float(hp.get("beta", 0.01))
        if compat:
            beta = float(int(beta))  # reference dsn.py:52 truncation
        return dict(
            beta=beta,
            num_episodes=int(hp.get("num_episodes", 5)),
            eps=float(hp.get("eps", 0.5)),
            far_sim=bool(int(hp.get("far_sim", 0))),
            temp_dist_thre=int(hp.get("temp_dist_thre", 20)),
            sup=bool(int(hp.get("sup", 0))),
        )

    def make_epoch_impl(self, optimizer):
        """The (unjitted) epoch program: scan over video groups of
        ``batch_size`` (default 1 == the reference's one-optimizer-step-per-
        video dynamics; larger groups take one step on the group-mean loss,
        with per-video EMA baselines still updated individually).  With
        ``--data_parallel N`` the group's video axis is shard-constrained
        over a dp mesh — the vmapped episodes/rewards compute locally, XLA
        psums the grads.  ``make_epoch_fn`` jits it; fold-parallel training
        vmaps it over a stacked fold axis first (train_folds below)."""
        cfg = self._cfg()
        apply_fn = self.spec.module.apply
        hp = self.hp
        E = cfg["num_episodes"]
        hps = self.hps
        batch_size = max(1, int(getattr(hps, "batch_size", 1)))
        dp = int(getattr(hps, "data_parallel", 0) or 0)
        dp_sharding = None
        if dp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from summarizer_tpu.parallel.mesh import make_mesh

            assert batch_size % dp == 0, (
                f"batch_size {batch_size} must divide over data_parallel={dp} "
                f"(reinforce groups shard their video axis)"
            )
            dp_sharding = NamedSharding(make_mesh(dp, dp=dp, tp=1), P("dp"))

        def loss_fn(params, x, t, m, baseline, rng):
            probs = apply_fn(params, x[None], m[None], rng=rng, train=True, hp=hp)[0]
            pmean = (probs * m).sum() / jnp.maximum(m.sum(), 1.0)
            loss = cfg["beta"] * (pmean - cfg["eps"]) ** 2
            if cfg["sup"]:
                loss = loss + bce_masked(probs, t, m)

            def episode(key):
                actions = jax.random.bernoulli(key, probs).astype(jnp.float32)
                logp = actions * jnp.log(jnp.maximum(probs, 1e-12)) + (
                    1.0 - actions
                ) * jnp.log(jnp.maximum(1.0 - probs, 1e-12))
                logp_mean = (logp * m).sum() / jnp.maximum(m.sum(), 1.0)
                reward = jax.lax.stop_gradient(
                    compute_reward(x, actions, m, cfg["far_sim"], cfg["temp_dist_thre"])
                )
                return -logp_mean * (reward - baseline), reward

            pg, rewards = jax.vmap(episode)(jax.random.split(rng, E))
            loss = (loss + pg.sum()) / float(E)  # dsn.py:139 episode average
            return loss, rewards.mean()

        def group_loss(params, xg, tg, mg, bg, rngs):
            losses, rewards = jax.vmap(
                lambda x, t, m, b, r: loss_fn(params, x, t, m, b, r)
            )(xg, tg, mg, bg, rngs)
            return losses.mean(), rewards

        def group_step(carry, inp):
            params, opt_state, baselines = carry
            x, t, m, idx, rngs = inp
            if dp_sharding is not None:
                x = jax.lax.with_sharding_constraint(x, dp_sharding)
                t = jax.lax.with_sharding_constraint(t, dp_sharding)
                m = jax.lax.with_sharding_constraint(m, dp_sharding)
            (loss, rewards), grads = jax.value_and_grad(group_loss, has_aux=True)(
                params, x, t, m, baselines[idx], rngs
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            baselines = baselines.at[idx].set(0.9 * baselines[idx] + 0.1 * rewards)
            return (params, opt_state, baselines), (loss, rewards.mean())

        def epoch(params, opt_state, baselines, feats, targets, mask, perm, rng):
            n = perm.shape[0]
            g = n // batch_size
            sel = perm[: g * batch_size].reshape(g, batch_size)
            xs = (
                feats[sel],
                targets[sel],
                mask[sel],
                sel,
                jax.random.split(rng, g * batch_size).reshape(g, batch_size, -1),
            )
            (params, opt_state, baselines), (losses, rewards) = jax.lax.scan(
                group_step, (params, opt_state, baselines), xs
            )
            return params, opt_state, baselines, losses.mean(), rewards.mean()

        return epoch

    def make_epoch_fn(self, optimizer):
        """The jitted epoch program (see make_epoch_impl)."""
        return jax.jit(self.make_epoch_impl(optimizer))

    def train_folds(self, splits: list[dict]) -> list[FoldResult] | None:
        """All CV folds trained simultaneously (``--fold_parallel``), as in
        train/supervised.py:train_folds: the fold axis becomes a vmapped
        batch dimension of ONE XLA program — stacked params/Adam states and
        per-fold EMA-baseline vectors, per-fold permutations indexing one
        shared dataset-wide pack, the fold-invariant eval program vmapped
        over stacked eval packs.  The K folds' vmapped episode rewards
        (the O(T^2) hot loop, dsn.py:185-236) fuse into batched
        contractions, lifting DSN's batch-1 arithmetic intensity.

        Per-fold seeds/keys match the sequential path at ``scan_chunk >= n``
        (one chunk per epoch); EMA baselines are keyed by video, so the
        trajectory is the sequential one up to float reassociation.

        Returns None when this run can't stack (see _fold_parallel_ready) —
        the caller falls back to the sequential per-fold path."""
        hps = self.hps
        k_folds = len(splits)
        if not self._fold_parallel_ready(splits):
            return None
        self.heartbeat()

        feats, targets, mask, fold_idx, n_all = self._stacked_fold_data(splits)
        n = fold_idx.shape[1]
        bs = max(1, int(getattr(hps, "batch_size", 1)))
        assert n >= bs, f"batch_size {bs} exceeds the folds' {n} train videos"

        for fold, s in enumerate(splits):
            self.draw_gtscores(fold, list(s["train_keys"]))

        rngs, params = self._stacked_init(k_folds)
        optimizer = torch_adam(
            float(hps.lr), float(hps.weight_decay), clip_norm=5.0
        )
        epoch_multi = getattr(self, "_train_program_stacked", None)
        if epoch_multi is None:
            epoch_multi = jax.jit(
                jax.vmap(
                    self.make_epoch_impl(optimizer),
                    in_axes=(0, 0, 0, None, None, None, 0, 0),
                )
            )
            self._train_program_stacked = epoch_multi
        opt_state = self._stacked_opt_init(optimizer, params, k_folds)
        # Per-video EMA reward baselines (dsn.py:81,149), one vector per fold
        # over GLOBAL video slots (the sequential path indexes fold-local
        # positions; the key -> baseline mapping is identical).
        baselines = jnp.zeros((k_folds, n_all), jnp.float32)
        params, opt_state, rngs, extras, start_epoch = self._stacked_resume_load(
            params, opt_state, rngs, {"baselines": baselines}
        )
        baselines = jnp.asarray(extras["baselines"])

        eval_multi, eval_feats, eval_mask, eval_batch = self._stacked_eval_setup(
            splits
        )

        if int(getattr(hps, "fused", 1) or 0) and start_epoch == 0:
            return self._train_folds_fused(
                splits, params, opt_state, baselines, rngs, feats, targets,
                mask, fold_idx, optimizer, eval_multi, eval_feats, eval_mask,
                eval_batch,
            )

        best = [FoldResult(-1.0, 0.0, 0.0, None) for _ in range(k_folds)]
        #: across-folds mean reward per epoch; convergence tests assert the
        #: sequential path's (per-fold) history, this mirrors it stacked.
        self.reward_history = []
        for epoch in range(start_epoch, int(hps.epochs)):
            # Sequential key stream at one chunk/epoch: split(rng, 4) for
            # (carry, perm, unused, eval), then one chunk key per fold.
            ks = jax.vmap(lambda r: jax.random.split(r, 4))(rngs)
            rngs, k_perm, k_ev = ks[:, 0], ks[:, 1], ks[:, 3]
            ks2 = jax.vmap(lambda r: jax.random.split(r))(rngs)
            rngs, k_c = ks2[:, 0], ks2[:, 1]
            perm_local = jax.vmap(lambda k: jax.random.permutation(k, n))(k_perm)
            perm = jnp.take_along_axis(fold_idx, perm_local, axis=1)
            params, opt_state, baselines, loss, reward = epoch_multi(
                params, opt_state, baselines, feats, targets, mask, perm, k_c
            )
            loss, reward = np.asarray(loss), np.asarray(reward)
            self.reward_history.append(float(reward.mean()))
            for f in range(k_folds):
                self.scalar(f, "Train", "Reward", float(reward[f]), epoch)
                self.scalar(f, "Train", "Loss", float(loss[f]), epoch)
            self.log.info(
                f"Epoch: {f'{epoch + 1}/{hps.epochs}':6}   Reward: "
                + "  ".join(f"{float(v):.05f}" for v in reward)
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
                self._stacked_maybe_save(
                    params, opt_state, rngs, {"baselines": baselines}, epoch + 1
                )
            self.heartbeat()

        if start_epoch < int(hps.epochs):
            self._stacked_maybe_save(
                params, opt_state, rngs, {"baselines": baselines},
                int(hps.epochs), force=True, final=True,
            )
        best = self._stacked_finalize(
            best, params, rngs, eval_multi, eval_feats, eval_mask, eval_batch
        )
        self.save_fold_metrics(self._stacked_state_path(), best)
        return best

    def _train_folds_fused(self, splits, params, opt_state, baselines, rngs,
                           feats, targets, mask, fold_idx, optimizer,
                           eval_multi, eval_feats, eval_mask, eval_batch,
                           fold_base: int = 0, state_path: str | None = None):
        """One-dispatch fold-parallel REINFORCE CV (see make_cv_fused_rl).
        Reward/loss curves and eval metrics come back stacked and are logged
        post-hoc, identical to the per-epoch path's TensorBoard output."""
        import time as _time

        hps = self.hps
        k_folds = len(splits)
        n = fold_idx.shape[1]
        epochs = int(hps.epochs)
        test_every = int(hps.test_every_epochs)

        cache = getattr(self, "_cv_programs", None)
        if cache is None:
            cache = self._cv_programs = {}
        cv = cache.get((k_folds, n))
        if cv is None:
            cv = make_cv_fused_rl(
                self.make_epoch_impl(optimizer),
                self._device_eval_program(),
                epochs=epochs, test_every=test_every, n=n,
            )
            cache[(k_folds, n)] = cv
        self.heartbeat()
        t0 = _time.time()
        (params, opt_state, baselines, rngs, best_c, best_a, best_m,
         best_params, losses, rewards, corrs, af1s, mf1s) = cv(
            params, opt_state, baselines, rngs, feats, targets, mask,
            fold_idx, eval_feats, eval_mask, eval_batch,
        )
        best_c, best_a, best_m, losses, rewards, corrs, af1s, mf1s = map(
            np.asarray,
            (best_c, best_a, best_m, losses, rewards, corrs, af1s, mf1s),
        )
        self.log.info(
            f"fused CV dispatch: {_time.time() - t0:.1f} s "
            f"({epochs} epochs x {k_folds} folds)"
        )
        self.heartbeat()
        self.reward_history = [float(r.mean()) for r in rewards]
        for epoch in range(epochs):
            for f in range(k_folds):
                self.scalar(fold_base + f, "Train", "Reward",
                            float(rewards[epoch, f]), epoch)
                self.scalar(fold_base + f, "Train", "Loss",
                            float(losses[epoch, f]), epoch)
            self.log.info(
                f"Epoch: {f'{epoch + 1}/{epochs}':6}   Reward: "
                + "  ".join(f"{float(v):.05f}" for v in rewards[epoch])
            )
            if epoch % test_every == 0:
                for f in range(k_folds):
                    self.scalar(fold_base + f, "Test", "Correlation",
                                float(corrs[epoch, f]), epoch)
                    self.scalar(fold_base + f, "Test", "F-score_avg",
                                float(af1s[epoch, f]), epoch)
                    self.scalar(fold_base + f, "Test", "F-score_max",
                                float(mf1s[epoch, f]), epoch)
        if state_path is not None:
            if getattr(hps, "resume", False):
                from summarizer_tpu.train.resume import TrainState

                self.maybe_save_state(
                    state_path,
                    TrainState(
                        params=jax.tree.map(lambda x: x[0], params),
                        opt_state=jax.tree.map(lambda x: x[0], opt_state),
                        epoch=epochs, rng=rngs[0],
                        # Global-slot baselines -> the sequential path's
                        # fold-local (train-key order) layout, so a later
                        # per-epoch resume loads a matching shape.
                        extras={"baselines": baselines[0][fold_idx[0]]},
                    ),
                    force=True, final=True,
                )
        else:
            self._stacked_maybe_save(
                params, opt_state, rngs, {"baselines": baselines}, epochs,
                force=True, final=True,
            )
        t0 = _time.time()
        best_params = jax.device_get(best_params)
        self.log.debug(f"fused CV best-params pull: {_time.time() - t0:.1f} s")
        best = [
            FoldResult(
                float(best_c[f]), float(best_a[f]), float(best_m[f]),
                None if best_c[f] <= -1.0
                else jax.tree.map(lambda x: x[f], best_params),
            )
            for f in range(k_folds)
        ]
        best = self._stacked_finalize(
            best, params, rngs, eval_multi, eval_feats, eval_mask, eval_batch
        )
        self.save_fold_metrics(
            state_path if state_path is not None else self._stacked_state_path(),
            best,
        )
        return best

    def _fold_fused_ready(self, fold: int, n_train: int) -> bool:
        """Single-fold fused eligibility (see supervised.py::_fold_fused_ready).
        The RL extra: the fold must fit one chunk (scan_chunk default 64) —
        chunked epochs draw extra per-chunk keys, changing the trajectory."""
        hps = self.hps
        if not int(getattr(hps, "fused", 1) or 0):
            return False
        if int(getattr(hps, "data_parallel", 0) or 0) > 1:
            return False
        corr_metric = str(getattr(hps, "correlation_metric", "spearmanr"))
        if not (bool(hps.eval_device) and corr_metric in ("spearmanr", "kendalltau")):
            return False
        if bool(getattr(hps, "profile", False)):
            return False
        bs = max(1, int(getattr(hps, "batch_size", 1)))
        chunk = max(1, min(int(self.hp.get("scan_chunk", 64)), n_train))
        chunk = max(bs, (chunk // bs) * bs)
        if chunk < n_train:
            return False
        if getattr(hps, "resume", False) and os.path.exists(self.state_path(fold)):
            return False
        return True

    def _train_fold_fused(self, fold: int, split: dict) -> FoldResult:
        """Sequential REINFORCE fold as ONE dispatch (see the supervised
        twin): stacked machinery, singleton fold axis, sequential seed."""
        hps = self.hps
        self.heartbeat()
        self.draw_gtscores(fold, list(split["train_keys"]))
        feats, targets, mask, fold_idx, n_all = self._stacked_fold_data([split])
        rngs, params = self._stacked_init(1, fold_base=fold)
        optimizer = torch_adam(
            float(hps.lr), float(hps.weight_decay), clip_norm=5.0
        )
        opt_state = self._stacked_opt_init(optimizer, params, 1)
        baselines = jnp.zeros((1, n_all), jnp.float32)
        eval_multi, eval_feats, eval_mask, eval_batch = self._stacked_eval_setup(
            [split]
        )
        return self._train_folds_fused(
            [split], params, opt_state, baselines, rngs, feats, targets,
            mask, fold_idx, optimizer, eval_multi, eval_feats, eval_mask,
            eval_batch, fold_base=fold, state_path=self.state_path(fold),
        )[0]

    def train_fold(self, fold: int, split: dict) -> FoldResult:
        hps = self.hps
        if self._fold_fused_ready(fold, len(split["train_keys"])):
            return self._train_fold_fused(fold, split)
        self.heartbeat()
        train_keys = list(split["train_keys"])
        test_keys = list(split["test_keys"])
        self.draw_gtscores(fold, train_keys)

        # Dataset-wide pack shared across folds (one upload per process);
        # the fold's local permutation composes with its global slots.
        # Baselines span ALL global slots — the fold only ever touches its
        # own videos' entries, so the EMA schedule is unchanged.
        feats, targets, mask, slots = self._shared_train_view(train_keys)
        slots_dev = jnp.asarray(slots)
        baselines = jnp.zeros(feats.shape[0], jnp.float32)

        rng = jax.random.PRNGKey(int(hps.seed) + fold)
        rng, k_init = jax.random.split(rng)
        params = self.init_params(k_init)
        # Fold-invariant programs, built once per engine (see supervised.py).
        cached = getattr(self, "_train_program", None)
        if cached is None:
            optimizer = torch_adam(
                float(hps.lr), float(hps.weight_decay), clip_norm=5.0
            )
            self._train_program = (optimizer, self.make_epoch_fn(optimizer))
        optimizer, epoch_fn = self._train_program
        opt_state = optimizer.init(params)
        eval_fn = self.make_eval_fn(test_keys)

        state_path = self.state_path(fold)
        start_epoch = 0
        if getattr(hps, "resume", False) and os.path.exists(state_path):
            from summarizer_tpu.train.resume import TrainState, load_state

            st = load_state(
                state_path,
                TrainState(params=params, opt_state=opt_state, rng=rng,
                           extras={"baselines": baselines}),
            )
            params, opt_state = st.params, st.opt_state
            rng, start_epoch = jnp.asarray(st.rng), st.epoch
            baselines = jnp.asarray(st.extras["baselines"])
            self.log.info(f"Resumed fold {fold} at epoch {start_epoch}")
            if st.light and start_epoch < int(hps.epochs):
                self.log.warning(
                    "resumed from a params-only fold-complete record with "
                    "epochs left to train: optimizer moments restart"
                )
            self.heartbeat()

        best = FoldResult(-1.0, 0.0, 0.0, params)
        #: per-epoch mean diversity+representativeness reward of the last
        #: trained fold; convergence tests assert it rises.
        self.reward_history = []
        n = len(train_keys)
        # Bound single device-execution time on large folds (LOL: 255 train
        # videos); one dispatch per chunk, same compiled program.  Chunks
        # stay multiples of the video-group size (the epoch program drops
        # group remainders, as in supervised.py — pick a batch_size that
        # divides the fold).
        bs = max(1, int(getattr(hps, "batch_size", 1)))
        assert n >= bs, (
            f"batch_size {bs} exceeds the fold's {n} train videos"
        )
        chunk = max(1, min(int(self.hp.get("scan_chunk", 64)), n))
        chunk = max(bs, (chunk // bs) * bs)
        for epoch in range(start_epoch, int(hps.epochs)):
            rng, k_perm, k_ep, k_ev = jax.random.split(rng, 4)
            # Same permutation draw as the per-fold-pack path; composing
            # with the global slots only changes the gather indices.
            perm = slots_dev[jax.random.permutation(k_perm, n)]
            losses, rewards = [], []
            for lo in range(0, n, chunk):
                sel = perm[lo : lo + chunk]
                rng, k_c = jax.random.split(rng)
                params, opt_state, baselines, loss_c, reward_c = epoch_fn(
                    params, opt_state, baselines, feats, targets, mask, sel, k_c
                )
                losses.append(float(loss_c) * sel.shape[0])
                rewards.append(float(reward_c) * sel.shape[0])
            loss = sum(losses) / n
            reward = sum(rewards) / n
            self.reward_history.append(float(reward))
            self.log.info(
                f"Epoch: {f'{epoch + 1}/{hps.epochs}':6}   "
                f"Reward: {float(reward):.05f}  Loss: {float(loss):.05f}"
            )
            self.scalar(fold, "Train", "Reward", float(reward), epoch)
            self.scalar(fold, "Train", "Loss", float(loss), epoch)

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
                        TrainState(params=params, opt_state=opt_state,
                                   epoch=epoch + 1, rng=rng,
                                   extras={"baselines": baselines}),
                    )
        if getattr(hps, "resume", False) and start_epoch < int(hps.epochs):
            # Fold-end save so resumed runs skip finished folds (see
            # adversarial.py — the wall-gated saves can be epochs stale).
            from summarizer_tpu.train.resume import TrainState

            self.maybe_save_state(
                state_path,
                TrainState(params=params, opt_state=opt_state,
                           epoch=int(hps.epochs), rng=rng,
                           extras={"baselines": baselines}),
                force=True, final=True,
            )
        if best.best_corr == -1.0 and best.best_max_f1 == 0.0:
            # No eval fired this run (e.g. a --resume retry landed at/past the
            # final epoch): prefer the sidecar's recorded best-epoch metrics
            # (see engine.save_fold_metrics); fall back to scoring current
            # params so the fold result is real instead of the sentinel.
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
