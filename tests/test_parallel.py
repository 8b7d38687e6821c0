"""Mesh parallelism on the virtual 8-device CPU mesh: sharded train step,
sharded eval == single-device eval, param sharding rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarizer_tpu.parallel import make_mesh, make_sharded_train_step, param_shardings


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8, dp=2, tp=4)


def test_param_sharding_rules(mesh):
    from summarizer_tpu.models import vasnet

    params = vasnet.init(jax.random.PRNGKey(0), {"input_size": 1024})
    sh = param_shardings(params, mesh)
    assert sh["Q"]["w"].spec == jax.sharding.PartitionSpec(None, "tp")
    assert sh["out"]["w"].spec == jax.sharding.PartitionSpec("tp", None)
    assert sh["norm"]["g"].spec == jax.sharding.PartitionSpec()


def test_sharded_train_step_runs_and_reduces_loss(mesh):
    from summarizer_tpu.models import logistic
    from summarizer_tpu.train.optim import torch_adam

    hp = {"input_size": 128}
    params = logistic.init(jax.random.PRNGKey(0), hp)
    opt = torch_adam(1e-2, 0.0)
    step, shard_params, shard_batch = make_sharded_train_step(
        logistic.apply, hp, opt, mesh
    )
    params = shard_params(params)
    opt_state = opt.init(params)
    rng = np.random.RandomState(0)
    x, t, m = shard_batch(
        jnp.asarray(rng.randn(4, 16, 128), jnp.float32),
        jnp.asarray(rng.rand(4, 16), jnp.float32),
        jnp.ones((4, 16)),
    )
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, x, t, m, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sharded_eval_matches_single_device(mesh, synth_records):
    from summarizer_tpu.data.batching import eval_static_dims, pack_eval
    from summarizer_tpu.models import logistic
    from summarizer_tpu.ops.eval_jax import evaluate_batch
    from summarizer_tpu.parallel.eval_parallel import make_sharded_eval

    records = synth_records  # 4 videos -> divides dp=2
    hp = {"input_size": 64}
    params = logistic.init(jax.random.PRNGKey(0), hp)
    s, g, u, f, cap = eval_static_dims(records, 0.15)
    batch, feats = pack_eval(records, s, g, u, f)
    mask = (np.arange(s)[None] < np.asarray(batch.n_steps)[:, None]).astype(np.float32)

    run = make_sharded_eval(
        logistic.apply, hp, mesh, proportion=0.15, method="knapsack",
        max_capacity=cap, out_frames=f,
    )
    corr_p, af1_p, mf1_p = run(params, batch, jnp.asarray(feats), jnp.asarray(mask),
                               jax.random.PRNGKey(1))

    scores = logistic.apply(params, jnp.asarray(feats), jnp.asarray(mask), hp=hp)
    corr_s, af1_s, mf1_s = jax.device_get(
        evaluate_batch(scores, jax.tree.map(jnp.asarray, batch), proportion=0.15,
                       method="knapsack", max_capacity=cap, out_frames=f)
    )
    np.testing.assert_allclose(corr_p, corr_s, atol=1e-5)
    np.testing.assert_allclose(af1_p, af1_s, atol=1e-5)
    np.testing.assert_allclose(mf1_p, mf1_s, atol=1e-5)
