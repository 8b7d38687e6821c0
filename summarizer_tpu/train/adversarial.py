"""Adversarial engines: SumGAN (VAE-GAN) and SumGAN-att (WGAN).

Ref: summarizer/models/sumgan.py:260-533 and sumgan_att.py:149-409.  Each
update takes a 3-phase step — (1) selector+encoder, (2) decoder, (3)
discriminator — each phase re-running the needed forwards with fresh noise
and stepping its own Adam.  Faithful torch details reproduced:

  - ``clip_grad_norm_(model.parameters(), 5.0)`` clips the global norm over
    ALL parameters that received grads, while the phase optimizer only steps
    its subset -> here: grads w.r.t. the full pytree, clipped globally, then
    an ``optax.masked`` Adam updates the subset and zeroes the rest.
  - VAE/AE pretraining phases (sumgan.py:320-355 / sumgan_att.py:195-230,
    the latter at lr*10).
  - Discriminator input noise (x * N(0,1)) for the first
    ``epoch_noise = 0.2*epochs`` epochs.
  - Label smoothing 0.9/0.1 for SumGAN; Wasserstein means for SumGAN-att.
  - SumGAN-att's ``sup`` defaults to True (sumgan_att.py:155).

TPU shape.  Batch-1 recurrent updates are HBM-bound: every LSTM timestep
re-streams the full weight matrices (~128 MB/step for the 2048-wide VAE), so
one video costs seconds regardless of FLOPs.  Two engine knobs address it:

  - ``batch_size`` (default 1 = exact reference dynamics): videos per
    3-phase update.  Grouping B videos amortizes the weight streaming B-fold;
    per-video loss terms are averaged (documented dynamics change).
  - ``scan_chunk`` (default 8): update groups per compiled program
    execution, bounding single-device-execution time (large folds, and the
    remote-TPU execution watchdog) at one dispatch per chunk.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from summarizer_tpu.models import sumgan as sg
from summarizer_tpu.models import sumgan_att as sga
from summarizer_tpu.train.engine import Engine, FoldResult
from summarizer_tpu.train.reinforce import bce_masked


# ----------------------------------------------------------------- utilities
def path_mask(params, includes: Sequence[tuple]):
    """Boolean pytree: True where the leaf's dict-path starts with any of
    the ``includes`` prefixes."""

    def rec(tree, path):
        if isinstance(tree, dict):
            return {k: rec(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            out = [rec(v, path + (i,)) for i, v in enumerate(tree)]
            return type(tree)(out) if isinstance(tree, tuple) else out
        return any(path[: len(inc)] == inc for inc in includes)

    return rec(params, ())


def masked_adam(lr, weight_decay, mask, clip_norm=5.0):
    """Global clip over ALL grads, masked torch-Adam over the subset,
    zero updates elsewhere."""
    inv = jax.tree.map(lambda b: not b, mask)
    inner = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(eps=1e-8),
        optax.scale(-lr),
    )
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.masked(inner, mask),
        optax.masked(optax.set_to_zero(), inv),
    )


def l2_norm_rows(a, b, mask=None):
    """Mean over the batch of per-video frobenius norms ||a_i - b_i||.
    Equals torch.norm(a - b) exactly at batch 1 (sumgan.py:292-294)."""
    d = a - b
    if mask is not None:
        d = d * mask[..., None]
    if d.ndim == 2:  # (B, H) discriminator embeddings
        per = (d * d).sum(-1)
    else:  # (B, T, D) sequences
        per = (d * d).reshape(d.shape[0], -1).sum(-1)
    return jnp.sqrt(jnp.maximum(per, 1e-24)).mean()


def kl_prior(mu, logvar):
    """-0.5 * sum(1 + logvar - mu^2 - exp(logvar)) per video, batch-averaged
    (sumgan.py:296-298; exact at batch 1).  mu/logvar: (L, B, H)."""
    kl = -0.5 * jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar), axis=(0, 2))
    return kl.mean()


def masked_mean_rows(v, mask):
    """(B,) per-video masked means."""
    return (v * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)


def _noise_mul(noise, key, x):
    """x * N(0,1) during the discriminator's input-noise epochs
    (sumgan.py:465-468).  ``noise`` may be a host bool (split-phase path,
    static: the no-noise variant never materializes the normals) or a traced
    bool (fused scan path)."""
    if isinstance(noise, (bool, int)) and not isinstance(noise, jnp.ndarray):
        return x * jax.random.normal(key, x.shape) if noise else x
    return jnp.where(noise, x * jax.random.normal(key, x.shape), x)


def bucketed_perm(slots_np, lengths, key, n, bucketed: bool):
    """The epoch's video order as GLOBAL pack slots: draw the same local
    permutation as the per-fold-pack path, compose with the fold's slots,
    and (optionally) stable-sort by 128-step length bucket so groups end up
    length-homogeneous (same-bucket videos stay shuffled) while every fold
    video still appears exactly once."""
    perm = slots_np[np.asarray(jax.random.permutation(key, n))]
    if bucketed:
        bucket_ids = (lengths[perm] + 127) // 128
        perm = perm[np.argsort(bucket_ids, kind="stable")]
    return perm


def _perm_chunks(perm, chunk):
    """Split the epoch's group sequence into device-execution-sized chunks
    (the tail chunk is smaller; it costs one extra compile)."""
    n = perm.shape[0]
    body = n - n % chunk
    for lo in range(0, body, chunk):
        yield perm[lo : lo + chunk]
    if n % chunk:
        yield perm[body:]


class _AdversarialBase(Engine):
    """Shared fold loop; subclasses provide _cfg, phase losses, pretrain."""

    #: set by subclasses whose 3-phase program has known worker-fatal
    #: (group, padded T) shapes on the tunneled backend (train/shape_guard.py)
    _shape_guard_tag: str | None = None

    def __init__(self, spec, hps, dataset, dataset_name):
        super().__init__(spec, hps, dataset, dataset_name)
        if self._shape_guard_tag is not None:
            from summarizer_tpu.train.shape_guard import guard_padded_t

            bs = max(1, int(self.hp.get("batch_size", hps.batch_size)))
            self.t_max = guard_padded_t(self._shape_guard_tag, bs, self.t_max)

    def _sizes(self, n):
        bs = max(1, min(int(self.hp.get("batch_size", self.hps.batch_size)), n))
        chunk = max(1, int(self.hp.get("scan_chunk", 4)))
        return bs, chunk

    def _dp_shard(self):
        """Video-axis sharding constraint for ``--data_parallel N`` (same
        contract as the supervised engine): the group's videos spread over
        the ``dp`` mesh axis, params stay replicated, and XLA emits the
        gradient psum over ICI.  Group-mean losses make the sharded step
        mathematically identical to the single-device one."""
        n = int(getattr(self.hps, "data_parallel", 0))
        if n <= 1:
            return lambda a: a
        from jax.sharding import NamedSharding, PartitionSpec as P

        from summarizer_tpu.parallel.mesh import make_mesh

        bs = max(1, int(self.hp.get("batch_size", self.hps.batch_size)))
        assert bs % n == 0, f"batch_size {bs} must divide over data_parallel={n}"
        sharding = NamedSharding(make_mesh(n, dp=n, tp=1), P("dp"))

        def shard(a):
            return jax.lax.with_sharding_constraint(a, sharding)

        return shard

    def train_fold(self, fold: int, split: dict) -> FoldResult:
        hps = self.hps
        self.heartbeat()
        cfg = self._cfg()
        train_keys = list(split["train_keys"])
        test_keys = list(split["test_keys"])
        self.draw_gtscores(fold, train_keys)

        # Dataset-wide pack shared across folds (one upload per process);
        # the fold's local permutation composes with its global slots.
        feats, targets, mask, slots = self._shared_train_view(train_keys)
        slots_np = np.asarray(slots)
        #: host-side true lengths indexed by GLOBAL slot (sel indices are
        #: global now), for length-bucketed group padding in the split-phase
        #: path (weight streaming of the recurrences scales with the padded
        #: T, so trimming groups to their own max saves both time and
        #: residual memory).
        self._host_lengths = self._full_lengths

        rng = jax.random.PRNGKey(int(hps.seed) + fold)
        rng, k_init = jax.random.split(rng)
        params = self.init_params(k_init)

        import os as _os

        state_path = self.state_path(fold)
        resuming = getattr(hps, "resume", False) and _os.path.exists(state_path)

        if cfg["pretrain_epochs"] > 0 and not resuming:
            # Any resume state already contains pretrained (or further-
            # trained) params — re-running the multi-minute VAE/AE pretrain
            # on a crash-retry would only throw its wall-clock away.
            rng, k_pre = jax.random.split(rng)
            self._pretrain_slots = slots_np
            params = self.pretrain(params, feats, targets, mask, cfg, k_pre)

        # Optimizers (masks depend only on tree structure) and the 3-phase
        # epoch program are fold-invariant: build once per engine, re-init
        # only the Adam moments per fold.  Saves a full re-trace of the
        # largest program in the zoo on every fold.
        cached = getattr(self, "_train_program", None)
        if cached is None:
            opts, _ = self.make_optimizers(params, cfg)
            self._train_program = (opts, self.make_epoch_fn(opts, cfg))
        opts, epoch_fn = self._train_program
        opt_states = tuple(o.init(params) for o in opts)
        eval_fn = self.make_eval_fn(test_keys)

        start_epoch = 0
        if resuming:
            from summarizer_tpu.train.resume import TrainState, load_state

            st = load_state(
                state_path,
                TrainState(params=params, opt_state=opt_states, rng=rng),
            )
            params, opt_states = st.params, st.opt_state
            rng, start_epoch = jnp.asarray(st.rng), st.epoch
            self.log.info(f"Resumed fold {fold} at epoch {start_epoch}")
            if st.light and start_epoch < int(hps.epochs):
                self.log.warning(
                    "resumed from a params-only fold-complete record with "
                    "epochs left to train: optimizer moments restart"
                )
            self.heartbeat()
        elif getattr(hps, "resume", False) and cfg["pretrain_epochs"] > 0:
            # Snapshot the post-pretrain state immediately: under the flaky
            # tunneled worker, a crash in the first epochs otherwise costs
            # the whole pretrain again on every retry.
            from summarizer_tpu.train.resume import TrainState

            self.maybe_save_state(
                state_path,
                TrainState(params=params, opt_state=opt_states, epoch=0,
                           rng=rng),
                force=True,
            )

        # Under donation the initial params buffer dies at the first phase
        # step — the snapshot must not alias it (filled on first improvement,
        # or from the live params at fold end).
        donating = getattr(self, "_donate_phases", False)
        best = FoldResult(-1.0, 0.0, 0.0, None if donating else params)
        n = len(train_keys)
        bs, chunk = self._sizes(n)
        epoch_noise = cfg["epoch_noise"]
        bucketed = bool(int(self.hp.get("bucket", bs >= 24)))
        for epoch in range(start_epoch, int(hps.epochs)):
            rng, k_perm, k_ep, k_ev = jax.random.split(rng, 4)
            perm = bucketed_perm(
                slots_np, self._host_lengths, k_perm, n, bucketed
            )
            groups = jnp.asarray(perm[: (n // bs) * bs].reshape(-1, bs))
            acc, count = None, 0
            for sel in _perm_chunks(groups, chunk):
                self.heartbeat(
                    f"3phase-scan epoch={epoch} groups={int(sel.shape[0])}"
                    f"x{int(sel.shape[-1])}"
                )
                k_ep, k_c = jax.random.split(k_ep)
                params, opt_states, stats = epoch_fn(
                    params, opt_states, feats, targets, mask, sel, k_c,
                    epoch < epoch_noise,
                )
                w = sel.shape[0]
                s = [float(v) * w for v in stats]
                acc = s if acc is None else [a + b for a, b in zip(acc, s)]
                count += w
            lse, ld, lc, dx, dxh, dxhp = (v / max(count, 1) for v in acc)
            self.log.info(
                f"Epoch: {f'{epoch + 1}/{hps.epochs}':6}   Lse: {lse:.05f}  "
                f"Ld: {ld:.05f}  Lc: {lc:.05f}  D(x): {dx:.05f}  "
                f"D(x_hat): {dxh:.05f}  D(x_hat_p): {dxhp:.05f}"
            )
            for tag, v in (
                ("Lse", lse), ("Ld", ld), ("Lc", lc),
                ("D_x", dx), ("D_x_hat", dxh), ("D_x_hat_p", dxhp),
            ):
                self.scalar(fold, "Train", tag, v, epoch)

            if epoch % int(hps.test_every_epochs) == 0:
                self.heartbeat(f"eval fold={fold} epoch={epoch}")
                corr, af1, mf1 = eval_fn(params, k_ev)
                self.scalar(fold, "Test", "Correlation", corr, epoch)
                self.scalar(fold, "Test", "F-score_avg", af1, epoch)
                self.scalar(fold, "Test", "F-score_max", mf1, epoch)
                best.best_avg_f1 = max(best.best_avg_f1, af1)
                best.best_max_f1 = max(best.best_max_f1, mf1)
                if corr > best.best_corr:
                    best.best_corr = corr
                    if donating:
                        # The params buffer will be donated at the next phase
                        # step, so an alias would die with it: pull the
                        # snapshot to host.  ~40 s per improvement for a full
                        # SumGAN through the 20 MB/s tunnel, bounded by the
                        # eval cadence (donation is enabled for HBM-marginal
                        # configs where the headroom is worth the pull).
                        t_pull = time.monotonic()
                        best.best_params = jax.device_get(params)
                        self.log.info(
                            "best-params host snapshot "
                            f"({time.monotonic() - t_pull:.0f}s)"
                        )
                    else:
                        # Device-resident snapshot: a device_get here pulled
                        # the full ~760 MB GAN params through the 20 MB/s
                        # tunnel per improvement (up to eval-cadence times per
                        # fold).  The epoch programs don't donate buffers, so
                        # the reference stays valid; the one pull happens at
                        # weights-save time.
                        best.best_params = params
            if getattr(hps, "resume", False):
                # Per-EPOCH (not per-eval) gated crash protection: a LOL
                # fold's epochs are ~4-5 min each against a worker MTBF of
                # ~8 min under GAN load — saving only at eval epochs left
                # multi-epoch stretches a crash would replay (the gate's
                # min-interval/3x-cost rule still limits actual save
                # frequency; summe/tvsum sweeps disable these entirely via
                # resume_mid_fold=0).
                from summarizer_tpu.train.resume import TrainState

                self.maybe_save_state(
                    state_path,
                    TrainState(params=params, opt_state=opt_states,
                               epoch=epoch + 1, rng=rng),
                )
        if getattr(hps, "resume", False) and start_epoch < int(hps.epochs):
            # Unconditional save at fold end: the wall-gated saves above can
            # be several epochs stale, which would make a resumed run re-train
            # the tail of an already-finished fold.
            from summarizer_tpu.train.resume import TrainState

            self.maybe_save_state(
                state_path,
                TrainState(params=params, opt_state=opt_states,
                           epoch=int(hps.epochs), rng=rng),
                force=True, final=True,
            )
        if best.best_corr == -1.0 and best.best_max_f1 == 0.0:
            # No eval fired this run (e.g. a --resume retry landed at/past the
            # final epoch): prefer the sidecar's recorded best-epoch metrics
            # (see engine.save_fold_metrics); fall back to scoring the
            # current params so the fold result is real, not the sentinel.
            rec = self.load_fold_metrics(state_path, 1)
            if rec is not None:
                self.log.info("fold metrics restored from sidecar record")
                best = FoldResult(rec[0][0], rec[0][1], rec[0][2], params)
            else:
                rng, k_fin = jax.random.split(rng)
                corr, af1, mf1 = eval_fn(params, k_fin)
                best = FoldResult(corr, af1, mf1, params)  # device-resident
        else:
            self.save_fold_metrics(state_path, [best])
        if best.best_params is None:
            # Donating fold where no eval improved on the sentinel (e.g. NaN
            # correlations): the final params are the only real candidate.
            best.best_params = params
        return best

    def pretrain(self, params, feats, targets, mask, cfg, rng):
        opt, loss_fn, tag = self._pretrain_setup(params, cfg)
        return self._run_pretrain(
            params, feats, mask, cfg, rng, opt, opt.init(params), loss_fn, tag
        )

    def make_epoch_fn(self, opts, cfg):
        return self._make_epoch(self.phase_losses(cfg), opts)

    # ---------------------------------------------------- fold-parallel (GAN)
    def _stacked_donate_argnums(self) -> tuple:
        """Donate (params, opt_state) into the stacked programs ONLY when no
        asynchronous checkpoint thread (engine.maybe_save_state) can still be
        reading those buffers when the next in-place update runs: either
        --resume is off (saves are no-ops) or mid-fold saves are disabled
        (the sweep's resume_mid_fold=0 — only the fold-END forced save
        remains, after which the chunk's buffers are never donated again).
        Otherwise the snapshot thread's device_get could race a donated
        (deleted) buffer."""
        hps = self.hps
        safe = (not getattr(hps, "resume", False)) or not int(
            self.hp.get("resume_mid_fold", 1)
        )
        return (0, 1) if safe else ()

    def _fold_parallel_chunk(self, k_folds: int) -> int:
        """How many folds can stack in one program.  Stacked GAN training
        holds, per fold, (params + the Adam moments of all 3 masked chains,
        which partition the tree) in f32 — ~3x params bytes.  The full
        5-fold SumGAN stack (~190 M params) is ~11.4 GB before activations,
        which does not fit a 16 GB chip; instead of refusing outright
        (round 3's behavior, VERDICT r3 item 2) the stack runs in CHUNKS of
        the largest fold count whose state fits ``fold_parallel_hbm_gb``
        (default 9 GB — leaves grads + lean-LSTM residuals headroom).
        Returns k_folds (single stack), 2..k-1 (chunked), or <2 (sequential
        fallback).  Sized abstractly via eval_shape — no device allocation."""
        shapes = jax.eval_shape(self.init_params, jax.random.PRNGKey(0))
        n_bytes = sum(
            int(np.prod(x.shape)) * 4 for x in jax.tree.leaves(shapes)
        )
        budget = float(self.hp.get("fold_parallel_hbm_gb", 9.0)) * 1e9
        per_fold = 3 * n_bytes
        c = min(k_folds, int(budget // per_fold)) if per_fold else k_folds
        if c < 2:
            self.log.info(
                f"fold_parallel: stacked state ~{per_fold * k_folds / 1e9:.1f} "
                f"GB (~{per_fold / 1e9:.1f} GB/fold) exceeds the "
                f"{budget / 1e9:.0f} GB budget even 2-fold-chunked — "
                "sequential path"
            )
        elif c < k_folds:
            self.log.info(
                f"fold_parallel: {k_folds}-fold stack ~{per_fold * k_folds / 1e9:.1f} "
                f"GB exceeds the {budget / 1e9:.0f} GB budget — chunked "
                f"stacks of {c} (~{per_fold * c / 1e9:.1f} GB state each)"
            )
        return c

    def pretrain_folds(self, params, feats, mask, cfg, rngs, fold_slots):
        """Stacked VAE/AE pretraining: the per-fold pretrain loop vmapped
        over the fold axis (same masked Adam, same per-fold RNG streams)."""
        template = jax.tree.map(lambda x: x[0], params)
        opt, loss_fn, tag = self._pretrain_setup(template, cfg)
        pre_multi = getattr(self, "_pretrain_stacked", None)
        if pre_multi is None:
            # Donating (params, opt_state) lets XLA update the multi-GB
            # stacked state in place instead of holding old+new copies —
            # the difference between a 3-fold SumGAN chunk fitting HBM or
            # not.  Callers rebind both from the return value.
            pre_multi = self._pretrain_stacked = jax.jit(
                jax.vmap(
                    self._pretrain_chunk_impl(opt, loss_fn),
                    in_axes=(0, 0, None, None, 0, 0),
                ),
                donate_argnums=self._stacked_donate_argnums(),
            )
        opt_state = jax.vmap(opt.init)(params)
        k_folds, n = fold_slots.shape
        bs, chunk = self._sizes(n)
        for epoch in range(cfg["pretrain_epochs"]):
            ks = jax.vmap(lambda r: jax.random.split(r, 3))(rngs)
            rngs, k_perm, k_ep = ks[:, 0], ks[:, 1], ks[:, 2]
            perms = np.stack(
                [
                    fold_slots[f][np.asarray(jax.random.permutation(k_perm[f], n))]
                    for f in range(k_folds)
                ]
            )
            groups = perms[:, : (n // bs) * bs].reshape(k_folds, -1, bs)
            total, count = 0.0, 0
            for lo in range(0, groups.shape[1], chunk):
                kc = jax.vmap(jax.random.split)(k_ep)
                k_ep, k_c = kc[:, 0], kc[:, 1]
                sel = jnp.asarray(groups[:, lo : lo + chunk])
                params, opt_state, loss = pre_multi(
                    params, opt_state, feats, mask, sel, k_c
                )
                total += float(np.asarray(loss).mean()) * sel.shape[1]
                count += sel.shape[1]
                self.heartbeat()
            if epoch % 10 == 0 or epoch == cfg["pretrain_epochs"] - 1:
                self.log.info(
                    f"Pretrain: {epoch + 1:3}/{cfg['pretrain_epochs']:3}   "
                    f"{tag} (mean over folds): {total / max(count, 1):.05f}"
                )
        return params

    def train_folds(self, splits) -> list[FoldResult] | None:
        """All CV folds of the 3-phase adversarial run trained as ONE vmapped
        program (``--fold_parallel``), mirroring the supervised engine's
        stacked path (train/supervised.py:train_folds): stacked params and
        3x masked-Adam states, per-fold permutations indexing the shared
        dataset-wide pack, stacked pretrain, and the vmapped device eval.

        Stacking K folds multiplies the parallel rows every timestep's
        recurrence matmuls feed the MXU by K and cuts the host dispatches
        (and per-fold program re-runs) per epoch by K — the costs that
        dominate the GAN sweep's wall-clock (VERDICT r2 item 1; the sweep's
        effective rate was ~10x below the isolated 3-phase step rate).
        When the full stack's train state exceeds the HBM budget, folds run
        in chunked stacks (``_fold_parallel_chunk``) instead of falling all
        the way back to sequential; later chunks are padded to the first
        chunk's size with duplicate folds so every chunk reuses ONE compiled
        3-phase program (the zoo's largest trace).  Returns None (sequential
        fallback) when folds can't stack at all."""
        hps = self.hps
        k_folds = len(splits)
        if not self._fold_parallel_ready(splits):
            return None
        cfg = self._cfg()
        self.heartbeat()
        bs, _ = self._sizes(len(splits[0]["train_keys"]))
        if bool(int(self.hp.get("split_phases", bs >= 24))) or bool(
            int(self.hp.get("bucket", bs >= 24))
        ):
            # Split-phase / per-group length bucketing pad each group to its
            # own shape (host-side loop) — that per-group control flow can't
            # ride a vmapped fold axis.
            self.log.info(
                "fold_parallel: split-phase/bucketed GAN config — sequential path"
            )
            return None
        chunk_folds = self._fold_parallel_chunk(k_folds)
        if chunk_folds < 2:
            return None
        if chunk_folds < k_folds:
            # Balance: ceil-split so the last chunk carries the fewest
            # duplicate pad folds (5 folds at cap 4 run as 3+2, not 4+1+3pads).
            n_chunks = -(-k_folds // chunk_folds)
            chunk_folds = -(-k_folds // n_chunks)
        for f, s in enumerate(splits):
            self.draw_gtscores(f, list(s["train_keys"]))
        results = []
        for base in range(0, k_folds, chunk_folds):
            part = splits[base : base + chunk_folds]
            pad = (chunk_folds - len(part)) if base else 0
            results.extend(
                self._train_folds_stack(part, cfg, base, pad,
                                        chunked=chunk_folds < k_folds)
            )
        return results

    def _train_folds_stack(self, splits, cfg, fold_base: int, pad: int,
                           chunked: bool) -> list[FoldResult]:
        """One stacked run over ``splits`` (a contiguous fold range starting
        at ``fold_base``).  ``pad`` duplicates of the last split are appended
        so every chunk matches the first chunk's stack size — one 3-phase
        compile total; padded folds train on real data under their own RNG
        streams and their results are dropped.  Chunked runs checkpoint
        under per-chunk state paths (engine._stacked_state_path tag)."""
        hps = self.hps
        k_real = len(splits)
        splits = list(splits) + [splits[-1]] * pad
        k_folds = len(splits)
        self._stacked_path_tag = f"_f{fold_base}" if chunked else ""
        feats, targets, mask, fold_idx, _ = self._stacked_fold_data(splits)
        fold_slots = np.asarray(fold_idx)
        n = fold_slots.shape[1]
        bs, chunk = self._sizes(n)

        rngs, params = self._stacked_init(k_folds, fold_base)

        import os as _os

        state_path = self._stacked_state_path()
        resuming = getattr(hps, "resume", False) and _os.path.exists(state_path)

        if cfg["pretrain_epochs"] > 0 and not resuming:
            ks = jax.vmap(jax.random.split)(rngs)
            rngs, k_pre = ks[:, 0], ks[:, 1]
            params = self.pretrain_folds(params, feats, mask, cfg, k_pre,
                                         fold_slots)

        opts, _ = self.make_optimizers(jax.tree.map(lambda x: x[0], params), cfg)
        epoch_multi = getattr(self, "_train_program_stacked", None)
        if epoch_multi is None:
            # Donate (params, opt_states): the stacked chunk's ~2.3 GB/fold
            # state updates in place (see pretrain_folds' donation note).
            epoch_multi = self._train_program_stacked = jax.jit(
                jax.vmap(
                    self._make_epoch_scan_impl(self.phase_losses(cfg), opts),
                    in_axes=(0, 0, None, None, None, 0, 0, None),
                ),
                donate_argnums=self._stacked_donate_argnums(),
            )
        opt_states = tuple(jax.vmap(o.init)(params) for o in opts)
        params, opt_states, rngs, _, start_epoch = self._stacked_resume_load(
            params, opt_states, rngs, {}
        )
        if not resuming and getattr(hps, "resume", False) and cfg["pretrain_epochs"] > 0:
            # Post-pretrain snapshot: a crash in the first epochs must not
            # re-buy the whole stacked pretrain on retry.
            self._stacked_maybe_save(params, opt_states, rngs, {}, 0, force=True)

        eval_multi, eval_feats, eval_mask, eval_batch = self._stacked_eval_setup(
            splits
        )
        best = [FoldResult(-1.0, 0.0, 0.0, None) for _ in range(k_real)]
        epoch_noise = cfg["epoch_noise"]
        tags = ("Lse", "Ld", "Lc", "D_x", "D_x_hat", "D_x_hat_p")
        for epoch in range(start_epoch, int(hps.epochs)):
            ks = jax.vmap(lambda r: jax.random.split(r, 4))(rngs)
            rngs, k_perm, k_ep, k_ev = ks[:, 0], ks[:, 1], ks[:, 2], ks[:, 3]
            perms = np.stack(
                [
                    fold_slots[f][np.asarray(jax.random.permutation(k_perm[f], n))]
                    for f in range(k_folds)
                ]
            )
            groups = perms[:, : (n // bs) * bs].reshape(k_folds, -1, bs)
            acc, count = None, 0
            for lo in range(0, groups.shape[1], chunk):
                self.heartbeat()
                kc = jax.vmap(jax.random.split)(k_ep)
                k_ep, k_c = kc[:, 0], kc[:, 1]
                sel = jnp.asarray(groups[:, lo : lo + chunk])
                params, opt_states, stats = epoch_multi(
                    params, opt_states, feats, targets, mask, sel, k_c,
                    epoch < epoch_noise,
                )
                w = sel.shape[1]
                s = [np.asarray(v) * w for v in stats]  # each (k,)
                acc = s if acc is None else [a + b for a, b in zip(acc, s)]
                count += w
            means = [v / max(count, 1) for v in acc]
            self.log.info(
                f"Epoch: {f'{epoch + 1}/{hps.epochs}':6}   "
                + "  ".join(
                    f"{t}: {float(np.mean(v)):.05f}" for t, v in zip(tags, means)
                )
                + "  (means over folds)"
            )
            for f in range(k_real):
                for t, v in zip(tags, means):
                    self.scalar(fold_base + f, "Train", t, float(v[f]), epoch)

            if epoch % int(hps.test_every_epochs) == 0:
                corr, af1, mf1 = map(
                    np.asarray,
                    eval_multi(params, k_ev, eval_feats, eval_mask, eval_batch),
                )
                for f in range(k_real):
                    self.scalar(fold_base + f, "Test", "Correlation",
                                float(corr[f]), epoch)
                    self.scalar(fold_base + f, "Test", "F-score_avg",
                                float(af1[f]), epoch)
                    self.scalar(fold_base + f, "Test", "F-score_max",
                                float(mf1[f]), epoch)
                self._stacked_best_update(best, params, corr, af1, mf1)
                self._stacked_maybe_save(params, opt_states, rngs, {}, epoch + 1)
        if start_epoch < int(hps.epochs):
            self._stacked_maybe_save(params, opt_states, rngs, {},
                                     int(hps.epochs), force=True, final=True)
        best = self._stacked_finalize(
            best, params, rngs, eval_multi, eval_feats, eval_mask, eval_batch
        )
        self.save_fold_metrics(self._stacked_state_path(), best)
        return best

    def _pretrain_chunk_impl(self, opt, loss_fn):
        """Unjitted pretrain chunk: one `lax.scan` over video groups running
        loss_fn + the masked pretrain Adam.  `_run_pretrain` jits it;
        `pretrain_folds` vmaps it over a stacked fold axis."""
        dp = self._dp_shard()

        def pre_chunk(p, s, feats_a, mask_a, sel, key):
            def group_step(carry, inp):
                pc, sc = carry
                sel_i, key_i = inp
                loss, grads = jax.value_and_grad(loss_fn)(
                    pc, dp(feats_a[sel_i]), dp(mask_a[sel_i]), key_i
                )
                upd, sc = opt.update(grads, sc, pc)
                return (optax.apply_updates(pc, upd), sc), loss

            xs = (sel, jax.random.split(key, sel.shape[0]))
            (p, s), losses = jax.lax.scan(group_step, (p, s), xs)
            return p, s, losses.mean()

        return pre_chunk

    def _run_pretrain(self, params, feats, mask, cfg, rng, opt, opt_state, loss_fn, tag):
        """Shared chunked pretrain loop over video groups.  The jitted chunk
        program is cached per (engine, tag): folds share shapes, and the
        caller's freshly-built opt/loss_fn are behaviorally identical each
        fold (masks depend only on tree structure)."""
        cache = getattr(self, "_pretrain_programs", {})
        if tag not in cache:
            cache[tag] = (opt, jax.jit(self._pretrain_chunk_impl(opt, loss_fn)))
            self._pretrain_programs = cache
        opt, pre_chunk = cache[tag]
        opt_state = opt.init(params)

        # Pretrain only this fold's train videos: ``feats`` is the shared
        # dataset-wide pack, so the permutation runs over the fold's global
        # slots (set by train_fold just before calling pretrain).
        slots = getattr(self, "_pretrain_slots", None)
        if slots is None:
            slots = np.arange(feats.shape[0], dtype=np.int32)
        n = len(slots)
        bs, chunk = self._sizes(n)
        for epoch in range(cfg["pretrain_epochs"]):
            rng, k_perm, k_ep = jax.random.split(rng, 3)
            perm = jnp.asarray(
                slots[np.asarray(jax.random.permutation(k_perm, n))]
            )
            groups = perm[: (n // bs) * bs].reshape(-1, bs)
            total, count = 0.0, 0
            for sel in _perm_chunks(groups, chunk):
                k_ep, k_c = jax.random.split(k_ep)
                self.heartbeat(
                    f"pretrain epoch={epoch} chunk={count // bs} "
                    f"B={int(sel.shape[-1])} T={int(feats.shape[1])}"
                )
                params, opt_state, loss = pre_chunk(
                    params, opt_state, feats, mask, sel, k_c
                )
                total += float(loss) * sel.shape[0]  # blocks: real progress
                count += sel.shape[0]
                self.heartbeat()
            if epoch % 10 == 0 or epoch == cfg["pretrain_epochs"] - 1:
                self.log.info(
                    f"Pretrain: {epoch + 1:3}/{cfg['pretrain_epochs']:3}   "
                    f"{tag}: {total / max(count, 1):.05f}"
                )
        return params

    def _make_epoch(self, phase_losses, opts):
        """Build the chunked 3-phase epoch program.  ``phase_losses`` are
        (loss_se(p, x, y, m, key), loss_d(p, x, m, key),
        loss_c(p, x, m, key, noise)); each phase re-draws its own noise.
        The video gather happens inside the traced program so the packed
        tensors stay ordinary jit arguments.

        At large video groups the per-step scan residuals of the 2048-wide
        recurrences exceed HBM, so each phase loss is rematerialized
        (``remat`` extra-param, default on for groups >= 16): backward
        recomputes the forward instead of storing residuals.  The nets are
        HBM-weight-streaming-bound, so the recompute adds ~1 forward of
        streaming per phase while unlocking the ~linear videos/s scaling
        with group size."""
        opt_se, opt_d, opt_c = opts
        loss_se, loss_d, loss_c = phase_losses
        bs = max(1, int(self.hp.get("batch_size", self.hps.batch_size)))
        # Large groups: three separately-jitted phase programs instead of one
        # fused scan.  The fused program trips an XLA HLO-pass crash at these
        # shapes (hlo_instruction.cc "Check failed: it != users_.end()"), and
        # with >= 2 groups per epoch at most, the scan buys nothing anyway.
        if bool(int(self.hp.get("split_phases", bs >= 24))):
            return self._make_epoch_split(
                (loss_se, loss_d, loss_c), opts
            )
        return jax.jit(self._make_epoch_scan_impl(phase_losses, opts))

    def _make_epoch_scan_impl(self, phase_losses, opts):
        """The unjitted fused-scan epoch program (one `lax.scan` over video
        groups, all three phases inside).  `_make_epoch` jits it;
        `train_folds` vmaps it over a stacked fold axis first."""
        opt_se, opt_d, opt_c = opts
        loss_se, loss_d, loss_c = phase_losses
        remat = bool(int(self.hp.get("remat", 0)))
        if remat:
            loss_se = jax.checkpoint(loss_se)
            loss_d = jax.checkpoint(loss_d)
            loss_c = jax.checkpoint(loss_c, static_argnums=())

        dp = self._dp_shard()

        def epoch_chunk(params, opt_states, feats, targets, mask, sel_groups, rng, noise):
            def group_step(carry, inp):
                params, (s_se, s_d, s_c) = carry
                sel, key, nz = inp
                x, y, m = dp(feats[sel]), dp(targets[sel]), dp(mask[sel])
                k1, k2, k3 = jax.random.split(key, 3)

                lse, g = jax.value_and_grad(loss_se)(params, x, y, m, k1)
                upd, s_se = opt_se.update(g, s_se, params)
                params = optax.apply_updates(params, upd)

                ld, g = jax.value_and_grad(loss_d)(params, x, m, k2)
                upd, s_d = opt_d.update(g, s_d, params)
                params = optax.apply_updates(params, upd)

                (lc, probs), g = jax.value_and_grad(loss_c, has_aux=True)(
                    params, x, m, k3, nz
                )
                upd, s_c = opt_c.update(g, s_c, params)
                params = optax.apply_updates(params, upd)

                return (params, (s_se, s_d, s_c)), (lse, ld, lc, *probs)

            g = sel_groups.shape[0]
            xs = (
                sel_groups,
                jax.random.split(rng, g),
                jnp.full((g,), noise, bool),
            )
            (params, opt_states), stats = jax.lax.scan(
                group_step, (params, opt_states), xs
            )
            return params, opt_states, tuple(s.mean() for s in stats)

        return epoch_chunk

    def _make_epoch_split(self, phase_losses, opts):
        """Same contract as `_make_epoch`'s epoch_chunk, built from three
        separately-jitted phase steps with a host-side loop over groups."""
        opt_se, opt_d, opt_c = opts
        loss_se, loss_d, loss_c = phase_losses

        dp = self._dp_shard()

        # Donate (params, opt_state) into each phase step: without it every
        # update transiently holds old+new params (2x780 MB) AND old+new
        # moments of that phase's Adam chain (2x up to 870 MB) on top of the
        # backward temps — measured round 4 as the margin between the
        # isolated (B=4, T=3200) step fitting and the full GAN x LOL sweep
        # OOMing at the same program.  Donation changes no numerics, but a
        # donated buffer dies at the next step call, so it is only safe when
        # nothing else holds the old params/opt_state across steps:
        # mid-fold state saves must be synchronous (save_sync) or disabled
        # (resume_mid_fold=0 / no resume) — an ASYNC save thread device_gets
        # a state the next epoch's first step has already donated.
        # train_fold handles the other alias (best_params) by pulling the
        # improvement snapshot to host when donation is active.
        hp = self.hp
        saves_overlap_steps = (
            getattr(self.hps, "resume", False)
            and int(hp.get("resume_mid_fold", 1))
            and not int(hp.get("save_sync", 0))
        )
        donate = bool(int(hp.get("donate", 0 if saves_overlap_steps else 1)))
        self._donate_phases = donate

        def phase_step(loss, opt, n_extra, static_argnums=()):
            def step(params, opt_state, x, *args):
                out, grads = jax.value_and_grad(loss, has_aux=n_extra)(
                    params, dp(x), *args
                )
                loss_val, aux = out if n_extra else (out, None)
                upd, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, upd), opt_state, loss_val, aux

            return jax.jit(step, static_argnums=static_argnums,
                           donate_argnums=(0, 1) if donate else ())

        step_se = phase_step(loss_se, opt_se, False)
        step_d = phase_step(loss_d, opt_d, False)
        # noise flag (arg 5: params, opt_state, x, m, key, noise) is static —
        # it is a host-known per-epoch bool, and tracing it as data would
        # materialize the three (B,T,D) noise tensors in no-noise epochs too.
        step_c = phase_step(loss_c, opt_c, True, static_argnums=(5,))

        from functools import partial

        @partial(jax.jit, static_argnums=(4,))
        def gather(feats, targets, mask, sel, bt):
            return feats[sel, :bt], targets[sel, :bt], mask[sel, :bt]

        lens = getattr(self, "_host_lengths", None)
        t_full = int(self.t_max)
        # Bucket granularity: every distinct padded T compiles its own
        # 3-phase program (minutes each on the 1-core tunneled host) and its
        # executable stays resident in HBM.  LOL's 800-3200 length spread at
        # the default 128-step quantum produces ~20 buckets x 3 phases; the
        # LOL GAN sweep sets bucket_quantum=1024 (~4 buckets), trading ~15%
        # more padded streaming for ~4x fewer compiles and their HBM.
        quantum = max(128, int(hp.get("bucket_quantum", 128)))

        def epoch_chunk(params, opt_states, feats, targets, mask, sel_groups, rng, noise):
            s_se, s_d, s_c = opt_states
            stats_acc = None
            g = int(sel_groups.shape[0])
            keys = jax.random.split(rng, g)
            sel_np = np.asarray(sel_groups)
            for gi in range(g):
                # Per-group pad: the group's own max length, rounded up to
                # 128 steps (one compile per distinct bucket, cached).  The
                # shape guard keeps a bucket from landing on a known
                # worker-fatal (group, T); t_full itself is guarded at init.
                if lens is not None:
                    mx = int(lens[sel_np[gi]].max())
                    bt = ((mx + quantum - 1) // quantum) * quantum
                    from summarizer_tpu.train.shape_guard import guard_padded_t

                    bt = min(t_full, guard_padded_t(
                        self._shape_guard_tag, int(sel_np[gi].size), bt
                    ))
                else:
                    bt = t_full
                # Per-group heartbeat WITH the program shape: the first LOL
                # epoch compiles one 3-phase program per 128-step bucket
                # (minutes each on a 1-core host) with no metric writes in
                # between — the sweep watchdog would otherwise read it as a
                # dead worker; and when a worker abort is deterministic the
                # payload names the killer shape (engine.heartbeat).
                self.heartbeat(
                    f"3phase group={gi}/{g} B={int(sel_np[gi].size)} bt={bt}"
                )
                x, y, m = gather(feats, targets, mask, sel_groups[gi], bt)
                k1, k2, k3 = jax.random.split(keys[gi], 3)
                params, s_se, lse, _ = step_se(params, s_se, x, y, m, k1)
                params, s_d, ld, _ = step_d(params, s_d, x, m, k2)
                params, s_c, lc, probs = step_c(params, s_c, x, m, k3, noise)
                stats = (lse, ld, lc, *probs)
                stats_acc = (
                    stats
                    if stats_acc is None
                    else tuple(a + b for a, b in zip(stats_acc, stats))
                )
            return params, (s_se, s_d, s_c), tuple(s / g for s in stats_acc)

        return epoch_chunk


# ======================================================================= SumGAN
class SumGANEngine(_AdversarialBase):
    _shape_guard_tag = "sumgan_3phase"  # QUIRKS.md worker abort @ (20, 648)

    def _cfg(self):
        hp = self.hp
        epochs = int(self.hps.epochs)
        return dict(
            sigma=float(hp.get("sigma", 0.3)),
            sup=bool(int(hp.get("sup", 0))),
            pretrain_epochs=int(hp.get("pretrain_vae", 20)),
            epoch_noise=int(hp.get("epoch_noise", 0.2 * epochs)),
        )

    def make_optimizers(self, params, cfg):
        lr, wd = float(self.hps.lr), float(self.hps.weight_decay)
        m_se = path_mask(params, [("s_lstm",), ("e_lstm",)])
        m_d = path_mask(params, [("d_lstm",)])
        m_c = path_mask(params, [("c_lstm",)])
        opts = tuple(masked_adam(lr, wd, m) for m in (m_se, m_d, m_c))
        return opts, tuple(o.init(params) for o in opts)

    def _pretrain_setup(self, params, cfg):
        """VAE pretraining: recon + KL on the raw sequence (sumgan.py:320-355)."""
        lr, wd = float(self.hps.lr), float(self.hps.weight_decay)
        m_vae = path_mask(params, [("e_lstm",), ("d_lstm",)])
        opt = masked_adam(lr, wd, m_vae)

        bs = max(1, int(self.hp.get("batch_size", self.hps.batch_size)))
        rm = bool(int(self.hp.get("remat", bs >= 24)))

        def loss_fn(p, x, m, key):
            lengths = m.sum(-1).astype(jnp.int32)
            x_hat, (mu, logvar) = sg.vae_forward(p, x, lengths, key, remat=rm)
            return l2_norm_rows(x, x_hat, m) + kl_prior(mu, logvar)

        return opt, loss_fn, "Lvae"

    def phase_losses(self, cfg):
        sigma, sup = cfg["sigma"], cfg["sup"]
        # Per-stage remat (sg._ck): default on for large video groups, where
        # the full sLSTM->VAE->cLSTM residual chain no longer fits HBM.
        bs = max(1, int(self.hp.get("batch_size", self.hps.batch_size)))
        rm = bool(int(self.hp.get("remat", bs >= 24)))

        def loss_se(p, x, y, m, key):
            x_hat, (mu, logvar), scores = sg.summarizer_forward(
                p, x, m, key, remat=rm
            )
            (_, h_real), (_, h_fake) = sg.discriminate_many(p, [x, x_hat], m, remat=rm)
            recons = l2_norm_rows(h_real, h_fake)
            prior = kl_prior(mu, logvar)
            sparsity = (
                bce_masked(scores, y, m) if sup
                else jnp.abs(masked_mean_rows(scores, m) - sigma).mean()
            )
            return recons + prior + sparsity

        def loss_d(p, x, m, key):
            x_hat, x_hat_p, _ = sg.summarizer_forward_pair(p, x, m, key, remat=rm)
            (_, h_real), (probs_fake, h_fake), (probs_uniform, _) = (
                sg.discriminate_many(p, [x, x_hat, x_hat_p], m, remat=rm)
            )
            recons = l2_norm_rows(h_real, h_fake)
            ones = jnp.ones_like(probs_fake)
            gan = bce_masked(probs_fake, 0.9 * ones, ones) + bce_masked(
                probs_uniform, 0.9 * ones, ones
            )
            return recons + gan

        def loss_c(p, x, m, key, noise):
            k1, k3, k4, k5 = jax.random.split(key, 4)
            x_hat, x_hat_p, _ = sg.summarizer_forward_pair(p, x, m, k1, remat=rm)
            x_in = _noise_mul(noise, k3, x)
            x_hat = _noise_mul(noise, k4, x_hat)
            x_hat_p = _noise_mul(noise, k5, x_hat_p)
            (pr, _), (pf, _), (pu, _) = sg.discriminate_many(
                p, [x_in, x_hat, x_hat_p], m, remat=rm
            )
            ones = jnp.ones_like(pr)
            loss = (
                bce_masked(pr, 0.9 * ones, ones)
                + bce_masked(pf, 0.1 * ones, ones)
                + bce_masked(pu, 0.1 * ones, ones)
            )
            return loss, (pr.mean(), pf.mean(), pu.mean())

        return loss_se, loss_d, loss_c


# ================================================================== SumGAN-att
class SumGANAttEngine(_AdversarialBase):
    def _cfg(self):
        hp = self.hp
        epochs = int(self.hps.epochs)
        return dict(
            sup=bool(int(hp.get("sup", 1))),  # defaults True (sumgan_att.py:155)
            pretrain_epochs=int(hp.get("pretrain_ae", 80)),
            epoch_noise=int(hp.get("epoch_noise", 0.2 * epochs)),
        )

    def make_optimizers(self, params, cfg):
        lr, wd = float(self.hps.lr), float(self.hps.weight_decay)
        m_se = path_mask(params, [("selector",), ("ae", "enc")])
        m_d = path_mask(params, [("ae", "dec")])
        m_c = path_mask(params, [("c_lstm",)])
        opts = tuple(masked_adam(lr, wd, m) for m in (m_se, m_d, m_c))
        return opts, tuple(o.init(params) for o in opts)

    def _pretrain_setup(self, params, cfg):
        """AE pretraining at lr*10: ||x - x_hat|| (sumgan_att.py:195-230)."""
        lr, wd = float(self.hps.lr) * 10.0, float(self.hps.weight_decay)
        hp = self.hp
        m_ae = path_mask(params, [("ae",)])
        opt = masked_adam(lr, wd, m_ae)
        heads = int(hp.get("ae_attention_heads", 4))

        def loss_fn(p, x, m, key):
            x_hat = sga.ae_apply(p["ae"], x, m, heads, key, True)
            return l2_norm_rows(x, x_hat, m)

        return opt, loss_fn, "Lae"

    def phase_losses(self, cfg):
        sup = cfg["sup"]
        hp = self.hp
        bs = max(1, int(self.hp.get("batch_size", self.hps.batch_size)))
        rm = bool(int(self.hp.get("remat", bs >= 24)))

        def loss_se(p, x, y, m, key):
            x_hat, scores = sga.summarizer_forward(p, x, m, key, hp)
            (_, h_real), (_, h_fake) = sg.discriminate_many(p, [x, x_hat], m, remat=rm)
            recons = l2_norm_rows(h_real, h_fake)
            sparsity = bce_masked(scores, y, m) if sup else 0.0
            return recons + sparsity

        def loss_d(p, x, m, key):
            k1, k2 = jax.random.split(key)
            x_hat, _ = sga.summarizer_forward(p, x, m, k1, hp)
            x_hat_p, _ = sga.summarizer_forward(p, x, m, k2, hp, uniform=True)
            (_, h_real), (pf, h_fake), (pu, _) = sg.discriminate_many(
                p, [x, x_hat, x_hat_p], m, remat=rm
            )
            recons = l2_norm_rows(h_real, h_fake)
            gan = jnp.mean(-0.5 * (pf + pu))  # WGAN generator (sumgan_att.py:187-189)
            return recons + gan

        def loss_c(p, x, m, key, noise):
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            x_hat, _ = sga.summarizer_forward(p, x, m, k1, hp)
            x_hat_p, _ = sga.summarizer_forward(p, x, m, k2, hp, uniform=True)
            x_in = _noise_mul(noise, k3, x)
            x_hat = _noise_mul(noise, k4, x_hat)
            x_hat_p = _noise_mul(noise, k5, x_hat_p)
            (pr, _), (pf, _), (pu, _) = sg.discriminate_many(
                p, [x_in, x_hat, x_hat_p], m, remat=rm
            )
            # WGAN discriminator (sumgan_att.py:191-193)
            loss = jnp.mean(-pr + 0.5 * (pf + pu))
            return loss, (pr.mean(), pf.mean(), pu.mean())

        return loss_se, loss_d, loss_c
