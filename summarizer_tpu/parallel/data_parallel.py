"""Sharded training step: dp over videos, tp over hidden dims.

Everything is declared through shardings and compiled with ``jax.jit``; XLA
GSPMD inserts the collectives (grad all-reduce over ``dp``, activation
reductions over ``tp``) so they ride ICI.  No NCCL-style user-level calls
exist — by design (SURVEY.md §2.4 consequence).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from summarizer_tpu.train.supervised import masked_mse

# Column-parallel (shard output dim) / row-parallel (shard input dim) matmul
# weights, Megatron-style.  Matched against the trailing dict path of each
# 2-D weight; everything else (biases, norms, embeddings) is replicated.
_COL_PARALLEL = ("Q", "K", "V", "k1", "lin1", "w_in", "mu", "logvar")
_ROW_PARALLEL = ("out", "lin2", "recons")


def _spec_for(path, leaf, tp_axis: str, tp_size: int) -> P:
    names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    parent = names[-2] if len(names) >= 2 else None
    leafname = names[-1]
    if leaf.ndim == 2 and leafname in ("w", "w_in"):
        target = leafname if leafname == "w_in" else parent
        if target in _COL_PARALLEL and leaf.shape[1] % tp_size == 0:
            return P(None, tp_axis)
        if target in _ROW_PARALLEL and leaf.shape[0] % tp_size == 0:
            return P(tp_axis, None)
    return P()


def param_shardings(params, mesh, tp_axis: str = "tp"):
    """NamedSharding pytree for the params under the given mesh."""
    tp_size = mesh.shape[tp_axis]

    def one(path, leaf):
        return NamedSharding(mesh, _spec_for(path, leaf, tp_axis, tp_size))

    return jax.tree_util.tree_map_with_path(one, params)


def make_sharded_train_step(apply_fn, hp, optimizer, mesh):
    """Jitted supervised train step over a (dp, tp) mesh.

    Batch tensors are sharded over ``dp`` on axis 0; params/opt state follow
    ``param_shardings``.  Returns (step_fn, shard_params, shard_batch).
    """
    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def loss_fn(params, x, t, m, rng):
        scores = apply_fn(params, x, m, rng=rng, train=True, hp=hp)
        return masked_mse(scores, t, m)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, t, m, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, t, m, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_params(params):
        return jax.device_put(params, param_shardings(params, mesh))

    def shard_batch(*arrays):
        return tuple(
            jax.device_put(a, batch_sh if jnp.ndim(a) >= 1 else repl) for a in arrays
        )

    return step, shard_params, shard_batch
