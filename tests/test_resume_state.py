"""TrainState checkpoint round-trips: full, light (params-only), and
backward compatibility with pre-light full-payload files."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from summarizer_tpu.train.resume import TrainState, load_state, save_state


def _setup():
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    opt = optax.adam(1e-3)
    s0 = opt.init(params)
    _, s1 = opt.update({"w": jnp.ones((2, 3))}, s0, params)  # nonzero moments
    return params, s0, s1


def _mu(state):
    return np.asarray(jax.tree_util.tree_leaves(state)[1])


def test_full_round_trip(tmp_path):
    params, s0, s1 = _setup()
    p = str(tmp_path / "full.ckpt")
    save_state(p, TrainState(params, s1, epoch=7, rng=jnp.zeros(2, jnp.uint32)))
    r = load_state(p, TrainState(params, s0, rng=jnp.zeros(2, jnp.uint32)))
    assert r.epoch == 7
    np.testing.assert_allclose(_mu(r.opt_state), _mu(s1))


def test_light_round_trip_keeps_template_moments(tmp_path):
    params, s0, s1 = _setup()
    p = str(tmp_path / "light.ckpt")
    save_state(p, TrainState(params, s1, epoch=9, rng=jnp.zeros(2, jnp.uint32)),
               light=True)
    full = str(tmp_path / "full.ckpt")
    save_state(full, TrainState(params, s1, epoch=9, rng=jnp.zeros(2, jnp.uint32)))
    import os

    assert os.path.getsize(p) < os.path.getsize(full)
    r = load_state(p, TrainState(params, s0, rng=jnp.zeros(2, jnp.uint32)))
    assert r.epoch == 9
    np.testing.assert_allclose(_mu(r.opt_state), _mu(s0))  # fresh moments
    np.testing.assert_allclose(np.asarray(r.params["w"]),
                               np.asarray(params["w"]))


def test_old_format_full_payload_loads(tmp_path):
    import flax.serialization

    params, s0, s1 = _setup()
    payload = {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(s1),
        "epoch": np.int64(3),
        "rng": np.zeros(2, np.uint32),
        "extras": {},
    }
    p = str(tmp_path / "old.ckpt")
    with open(p, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    r = load_state(p, TrainState(params, s0, rng=jnp.zeros(2, jnp.uint32)))
    assert r.epoch == 3
    np.testing.assert_allclose(_mu(r.opt_state), _mu(s1))
