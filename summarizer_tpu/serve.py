"""Serving API: load a checkpoint, score videos, assemble summaries.

Production-shaped inference on top of the zoo: one warm compiled forward per
length bucket (power-of-two padded, so arbitrary-length videos hit a small
fixed set of programs), batched scoring, and the host-exact summary
assembly.  The reference's equivalent is the tail of its training script
(summarizer/models/__init__.py:142-177); here it is a standalone component:

    scorer = Scorer.from_checkpoint("vasnet", "weights.ckpt", hp={"local": 30})
    result = scorer.summarize(features, n_frames, picks, change_points, nfps)
    result.scores, result.machine_summary
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from summarizer_tpu.models import get_model
from summarizer_tpu.ops import eval_np
from summarizer_tpu.train.checkpoint import load_params


@dataclass
class SummaryResult:
    scores: np.ndarray  # (n_steps,) per-step importance
    machine_scores: np.ndarray  # (n_frames,) upsampled
    machine_summary: np.ndarray  # (n_frames,) binary keyshots


def _bucket(t: int, min_bucket: int = 128) -> int:
    b = min_bucket
    while b < t:
        b *= 2
    return b


class Scorer:
    """Warm, bucketed, batched inference for one model."""

    def __init__(self, model: str, params, hp: dict | None = None,
                 proportion: float = 0.15, method: str = "knapsack",
                 sp: int | None = None):
        self.model = model
        self.spec = get_model(model)
        self.params = params
        self.hp = dict(hp or {})
        self.proportion = proportion
        self.method = method
        self._fns: dict[int, callable] = {}
        # Sequence-parallel serving (parallel/sequence_parallel.py): shard
        # the time axis of each bucket over an sp-device mesh — for videos
        # whose activations outgrow one chip.  Engages per bucket, only when
        # the bucket divides the mesh and (banded models) the per-shard slab
        # covers the aperture; other buckets fall back to single-device.
        self._mesh = None
        if sp is not None and int(sp) > 1:
            from summarizer_tpu.parallel.sequence_parallel import make_sp_mesh

            self._mesh = make_sp_mesh(int(sp))

    @classmethod
    def from_checkpoint(cls, model: str, path: str, hp: dict | None = None, **kw):
        spec = get_model(model)
        template = spec.module.init(jax.random.PRNGKey(0), dict(hp or {}))
        return cls(model, load_params(path, template), hp, **kw)

    def _sp_apply(self, t_pad: int):
        """The sequence-parallel apply for this bucket, or None if sp is off
        / the bucket can't shard (indivisible, or aperture > slab)."""
        mesh = self._mesh
        if mesh is None or t_pad % mesh.size != 0:
            return None
        if self.model == "vasnet":
            aperture = self.hp.get("local")
            if aperture is not None and t_pad // mesh.size < int(aperture):
                return None
            from summarizer_tpu.parallel.sequence_parallel import sp_vasnet_apply

            return partial(sp_vasnet_apply, mesh=mesh)
        if self.model == "transformer":
            from summarizer_tpu.parallel.sequence_parallel import (
                sp_transformer_apply,
            )

            return partial(sp_transformer_apply, mesh=mesh)
        return None

    def _fn(self, t_pad: int):
        if t_pad not in self._fns:
            apply_fn = self._sp_apply(t_pad) or self.spec.module.apply
            hp = self.hp

            @jax.jit
            def fwd(params, x, mask):
                return apply_fn(params, x, mask, rng=jax.random.PRNGKey(0),
                                train=False, hp=hp)

            self._fns[t_pad] = fwd
        return self._fns[t_pad]

    def score(self, features_list: list[np.ndarray]) -> list[np.ndarray]:
        """Per-step scores for a batch of (n_steps, D) feature arrays; one
        compiled program per length bucket."""
        t_pad = _bucket(max(f.shape[0] for f in features_list))
        b, d = len(features_list), features_list[0].shape[1]
        x = np.zeros((b, t_pad, d), np.float32)
        m = np.zeros((b, t_pad), np.float32)
        for i, f in enumerate(features_list):
            x[i, : f.shape[0]] = f
            m[i, : f.shape[0]] = 1.0
        scores = np.asarray(self._fn(t_pad)(self.params, x, m))
        return [scores[i, : f.shape[0]] for i, f in enumerate(features_list)]

    def summarize(self, features, n_frames, picks, change_points, nfps) -> SummaryResult:
        """Full pipeline for one video: scores -> upsample -> keyshots."""
        probs = self.score([np.asarray(features, np.float32)])[0]
        machine_scores = eval_np.generate_scores(probs, int(n_frames), picks)
        machine_summary = eval_np.generate_summary(
            probs, change_points, int(n_frames), nfps, picks,
            self.proportion, self.method,
        )
        return SummaryResult(probs, machine_scores, machine_summary)
