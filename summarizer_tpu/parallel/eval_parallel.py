"""Data-parallel full-dataset evaluation.

Shards the eval video axis over the ``dp`` mesh axis: every device scores
and evaluates its slice of videos (model forward, upsample, Spearman,
knapsack DP, F1 all run per-video), and only the per-video scalar metrics
are gathered.  With B videos over D devices the whole-dataset eval costs
B/D video-evals of wall-clock — this is the "full-dataset eval runs
on-device" north star scaled to a pod slice.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from summarizer_tpu.ops.eval_jax import evaluate_batch


def make_sharded_eval(apply_fn, hp, mesh, *, proportion, method, max_capacity, out_frames):
    """Returns run(params, batch, feats, mask, rng) -> per-video metric
    triplets, with the video axis sharded over ``dp``.

    The eval batch's leading (video) axis must divide the dp size; pad with
    replicated dummy videos and mask downstream if it does not.
    """
    dp_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, static_argnames=())
    def program(params, feats, mask, batch, rng):
        feats = jax.lax.with_sharding_constraint(feats, dp_sh)
        mask = jax.lax.with_sharding_constraint(mask, dp_sh)
        batch = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, dp_sh), batch
        )
        scores = apply_fn(params, feats, mask, rng=rng, train=False, hp=hp)
        return evaluate_batch(
            scores,
            batch,
            proportion=proportion,
            method=method,
            max_capacity=max_capacity,
            out_frames=out_frames,
        )

    def run(params, batch, feats, mask, rng):
        params = jax.device_put(params, jax.tree.map(lambda _: repl, params))
        corr, af1, mf1 = program(params, feats, mask, batch, rng)
        return np.asarray(corr), np.asarray(af1), np.asarray(mf1)

    return run
