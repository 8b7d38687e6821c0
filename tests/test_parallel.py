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


def test_sumgan_dp_matches_single_device(tmp_path, synth_h5):
    """GAN 3-phase training sharded over dp == single-device numbers: the
    group-mean losses turn the video-axis sharding into a pure grad psum."""
    import h5py

    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.data.splits import write_splits
    from summarizer_tpu.train.loop import make_engine
    from summarizer_tpu.utils.config import HParameters

    with h5py.File(synth_h5) as f:
        keys = list(f.keys())
    sp = str(tmp_path / "synthetic_splits_overfit.json")
    write_splits([{"train_keys": keys, "test_keys": keys}], sp)

    def run(dp):
        hps = HParameters().load_from_args(
            dict(
                model="sumgan",
                datasets=str(synth_h5),
                splits_files=sp,
                epochs=2,
                test_every_epochs=1,
                data_parallel=dp,
                log_dir=str(tmp_path / f"logs_dp{dp}"),
                tensorboard=False,
                log_level="error",
                extra_params={
                    "input_size": 64, "sLSTM_hidden_size": 16,
                    "edLSTM_hidden_size": 24, "cLSTM_hidden_size": 16,
                    "pretrain_vae": 1, "batch_size": 4,
                },
            )
        )
        sf = hps.splits_files[0]
        dataset = SummarizerDataset(hps.dataset_of_file[sf])
        engine = make_engine(hps, dataset, hps.dataset_name_of_file[sf])
        return engine.train_fold(0, hps.splits_of_file[sf][0])

    r_single = run(0)
    r_dp = run(4)
    for a, b in zip(
        jax.tree.leaves(r_single.best_params), jax.tree.leaves(r_dp.best_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    assert abs(r_single.best_corr - r_dp.best_corr) < 1e-5
