"""Pipeline-parallel transformer == single-device transformer, virtual mesh.

The pp path (parallel/pipeline_parallel.py) stages the encoder stack over
mesh devices and streams microbatches GPipe-style; outputs, losses, and
gradients must reproduce the dense models/transformer.py apply exactly
(microbatching splits the batch axis only — every per-video computation is
batch-independent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarizer_tpu.models import transformer
from summarizer_tpu.parallel.pipeline_parallel import (
    make_pp_forward,
    make_pp_mesh,
    make_pp_train_step,
    pp_transformer_apply,
)
from summarizer_tpu.train.optim import torch_adam
from summarizer_tpu.train.supervised import masked_mse

B, T, D = 4, 64, 32


def _setup(n_layers, heads, seed=0):
    hp = dict(
        input_size=D, encoder_layers=n_layers, attention_heads=heads,
        pos_embed="simple", max_pos=T, flash=0,
    )
    params = transformer.init(jax.random.PRNGKey(seed), hp)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 50:] = 0.0
    mask[3, 20:] = 0.0
    return hp, params, x, jnp.asarray(mask)


@pytest.mark.parametrize(
    "pp,n_layers,n_micro", [(4, 4, 4), (2, 6, 2), (4, 8, 1), (1, 2, 2)]
)
def test_pp_forward_matches_dense(pp, n_layers, n_micro):
    hp, params, x, mask = _setup(n_layers, heads=4)
    ref = transformer.apply(params, x, mask, rng=None, train=False, hp=hp)
    mesh = make_pp_mesh(pp)
    got = pp_transformer_apply(
        params, x, mask, mesh=mesh, n_micro=n_micro, rng=None, train=False, hp=hp
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pp_sharded_params_path():
    """Stacked, stage-sharded params (the real memory layout) give the same
    scores as the replicated list-of-layers path."""
    hp, params, x, mask = _setup(n_layers=4, heads=4, seed=1)
    ref = transformer.apply(params, x, mask, rng=None, train=False, hp=hp)
    mesh = make_pp_mesh(4)
    fwd, shard_params = make_pp_forward(hp, mesh, n_micro=2)
    sharded = shard_params(params)
    leaf = jax.tree.leaves(sharded["layers"])[0]
    assert len(leaf.sharding.device_set) == 4  # layer axis really is staged
    got = fwd(sharded, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pp_grads_match_dense():
    hp, params, x, mask = _setup(n_layers=4, heads=2, seed=2)
    targets = jnp.asarray(np.random.RandomState(7).rand(B, T), jnp.float32)
    mesh = make_pp_mesh(4)

    def loss_dense(p):
        s = transformer.apply(p, x, mask, rng=None, train=False, hp=hp)
        return masked_mse(s, targets, mask)

    def loss_pp(p):
        s = pp_transformer_apply(
            p, x, mask, mesh=mesh, n_micro=4, rng=None, train=False, hp=hp
        )
        return masked_mse(s, targets, mask)

    l_ref, g_ref = jax.value_and_grad(loss_dense)(params)
    l_pp, g_pp = jax.value_and_grad(loss_pp)(params)
    np.testing.assert_allclose(float(l_pp), float(l_ref), atol=1e-6)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_pp)[0],
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=str(path)
        )


def test_pp_train_step_learns():
    """One jitted pp train step with dropout active: finite loss, params
    move, loss decreases over a few steps on a fixed batch."""
    hp, params, x, mask = _setup(n_layers=4, heads=4, seed=3)
    hp["dropout"] = 0.1
    targets = jnp.asarray(np.random.RandomState(5).rand(B, T), jnp.float32)
    mesh = make_pp_mesh(4)
    step, shard_params = make_pp_train_step(hp, torch_adam(1e-3, 0.0), mesh, n_micro=2)
    params = shard_params(params)
    opt_state = torch_adam(1e-3, 0.0).init(params)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(
            params, opt_state, x, targets, mask, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_pp_rejects_bad_stage_split():
    hp, params, x, mask = _setup(n_layers=6, heads=2, seed=4)
    mesh = make_pp_mesh(4)
    with pytest.raises(AssertionError, match="divide over pp"):
        pp_transformer_apply(
            params, x, mask, mesh=mesh, rng=None, train=False, hp=hp
        )
