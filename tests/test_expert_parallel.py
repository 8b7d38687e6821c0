"""MoE transformer scorer + expert parallelism on the virtual 8-device mesh.

The ep path (parallel/expert_parallel.py) shards the stacked expert banks'
E axis over the mesh; the router stays replicated, so scores, losses, and
gradients must reproduce the single-device transformer_moe apply exactly
(only the expert contraction is partitioned, combined with one psum).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarizer_tpu.models import transformer_moe
from summarizer_tpu.nn.moe import moe_ffn_apply, moe_ffn_init, moe_gate
from summarizer_tpu.parallel.expert_parallel import (
    ep_expert_override,
    make_ep_forward,
    make_ep_mesh,
    make_ep_train_step,
)
from summarizer_tpu.train.optim import torch_adam

B, T, D = 4, 32, 64

HP = dict(
    input_size=D, encoder_layers=2, attention_heads=4, n_experts=8, top_k=2,
    flash=0,
)


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 20:] = 0.0
    mask[3, 5:] = 0.0
    return x, jnp.asarray(mask)


# ------------------------------------------------------------ moe layer unit
def test_gate_combine_is_topk_and_masked():
    p = moe_ffn_init(jax.random.PRNGKey(0), D, D, 8)
    x, mask = _batch()
    combine, aux = moe_gate(p["gate"], x, mask, top_k=2)
    c = np.asarray(combine)
    # exactly top_k nonzero weights per valid token, summing to 1
    nz = (c > 0).sum(-1)
    valid = np.asarray(mask) > 0
    assert (nz[valid] == 2).all()
    np.testing.assert_allclose(c[valid].sum(-1), 1.0, atol=1e-6)
    # padded steps route nowhere
    assert (c[~valid] == 0).all()
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_balanced_router_aux_is_one():
    """With perfectly uniform routing the Switch aux equals 1 (its minimum
    for a stochastic router): E * sum_e (1/E * 1/E) * E = 1."""
    p = moe_ffn_init(jax.random.PRNGKey(1), D, D, 4)
    p["gate"]["w"] = jnp.zeros_like(p["gate"]["w"])  # uniform probs
    x, mask = _batch(1)
    _, aux = moe_gate(p["gate"], x, mask, top_k=1)
    # uniform probs: P_e = 1/E exactly; top-1 f_e depends on tie-breaking but
    # sum_e f_e = 1, so aux = E * sum_e f_e/E = 1 regardless.
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-5)


def test_single_expert_moe_matches_dense_ffn():
    """E=1, top_k=1: the MoE layer must reduce to the plain two-layer ReLU
    FFN with the same weights (router contributes a constant weight 1)."""
    p = moe_ffn_init(jax.random.PRNGKey(2), D, D, 1)
    x, mask = _batch(2)
    y, _ = moe_ffn_apply(p, x, mask, top_k=1)
    ref = jax.nn.relu(x @ p["w1"][0] + p["b1"][0]) @ p["w2"][0] + p["b2"][0]
    ref = ref * np.asarray(mask)[..., None]
    got = np.asarray(y) * np.asarray(mask)[..., None]
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)


# --------------------------------------------------------------- model level
def test_moe_scorer_abi():
    params = transformer_moe.init(jax.random.PRNGKey(3), HP)
    x, mask = _batch(3)
    scores = transformer_moe.apply(params, x, mask, rng=None, train=False, hp=HP)
    s = np.asarray(scores)
    assert s.shape == (B, T) and (s >= 0).all() and (s <= 1).all()


# ------------------------------------------------------------------- ep path
@pytest.mark.parametrize("ep", [2, 4, 8])
def test_ep_forward_matches_replicated(ep):
    params = transformer_moe.init(jax.random.PRNGKey(4), HP)
    x, mask = _batch(4)
    ref = transformer_moe.apply(params, x, mask, rng=None, train=False, hp=HP)
    mesh = make_ep_mesh(ep)
    hp_ep = {**HP, "moe_override": ep_expert_override(mesh)}
    got = transformer_moe.apply(params, x, mask, rng=None, train=False, hp=hp_ep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_ep_sharded_params_path():
    """Expert banks physically sharded over 8 devices (the real memory
    layout) give the same scores as the replicated path."""
    params = transformer_moe.init(jax.random.PRNGKey(5), HP)
    x, mask = _batch(5)
    ref = transformer_moe.apply(params, x, mask, rng=None, train=False, hp=HP)
    mesh = make_ep_mesh(8)
    fwd, shard_params = make_ep_forward(HP, mesh)
    sharded = shard_params(params)
    w1 = sharded["layers"][0]["moe"]["w1"]
    assert len(w1.sharding.device_set) == 8  # E axis really is sharded
    got = fwd(sharded, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_ep_grads_match_replicated():
    from summarizer_tpu.train.supervised import masked_mse

    params = transformer_moe.init(jax.random.PRNGKey(6), HP)
    x, mask = _batch(6)
    targets = jnp.asarray(np.random.RandomState(9).rand(B, T), jnp.float32)
    mesh = make_ep_mesh(4)
    hp_ep = {**HP, "moe_override": ep_expert_override(mesh)}

    def loss(p, hp):
        s, aux = transformer_moe.apply_with_aux(
            p, x, mask, rng=None, train=False, hp=hp
        )
        return masked_mse(s, targets, mask) + 0.01 * aux

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, HP))(params)
    l_ep, g_ep = jax.value_and_grad(lambda p: loss(p, hp_ep))(params)
    np.testing.assert_allclose(float(l_ep), float(l_ref), atol=1e-6)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ep)[0],
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=str(path)
        )


def test_ep_train_step_learns():
    params = transformer_moe.init(jax.random.PRNGKey(7), HP)
    x, mask = _batch(7)
    targets = jnp.asarray(np.random.RandomState(11).rand(B, T), jnp.float32)
    mesh = make_ep_mesh(8)
    opt = torch_adam(1e-3, 0.0)
    step, shard_params = make_ep_train_step({**HP, "dropout": 0.1}, opt, mesh)
    params = shard_params(params)
    opt_state = opt.init(params)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(
            params, opt_state, x, targets, mask, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_ep_sharded_params_checkpoint_roundtrip(tmp_path):
    """Expert-sharded params must survive save -> load -> re-shard: the
    benchmark sweep's crash-recovery path (train/checkpoint.py gathers to
    host; shard_params relays the restored copy)."""
    from summarizer_tpu.train.checkpoint import load_params, save_params

    params = transformer_moe.init(jax.random.PRNGKey(10), HP)
    mesh = make_ep_mesh(8)
    fwd, shard_params = make_ep_forward(HP, mesh)
    sharded = shard_params(params)
    path = str(tmp_path / "moe.ckpt")
    save_params(path, sharded)
    template = transformer_moe.init(jax.random.PRNGKey(11), HP)
    restored = shard_params(load_params(path, template))
    x, mask = _batch(10)
    np.testing.assert_allclose(
        np.asarray(fwd(restored, x, mask)),
        np.asarray(fwd(sharded, x, mask)),
        atol=0,
    )


def test_ep_rejects_bad_expert_split():
    params = transformer_moe.init(jax.random.PRNGKey(8), {**HP, "n_experts": 3})
    x, mask = _batch(8)
    mesh = make_ep_mesh(2)
    hp_ep = {**HP, "n_experts": 3, "moe_override": ep_expert_override(mesh)}
    with pytest.raises(AssertionError, match="divide over ep"):
        transformer_moe.apply(params, x, mask, rng=None, train=False, hp=hp_ep)
