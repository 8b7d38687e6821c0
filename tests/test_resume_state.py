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


def test_sharded_round_trip_tuple_opt(tmp_path):
    """save_state_sharded: params + EACH optimizer chain in its own part
    file, manifest last; load_state auto-detects and restores the full
    state (Adam moments included) bit-exactly. VERDICT r2 item 8."""
    import os

    from summarizer_tpu.train.resume import save_state_sharded

    params, s0, s1 = _setup()
    opt2 = optax.adam(2e-3)
    t0 = opt2.init(params)
    _, t1 = opt2.update({"w": jnp.full((2, 3), 0.5)}, t0, params)
    p = str(tmp_path / "sharded.ckpt")
    save_state_sharded(
        p, TrainState(params, (s1, t1), epoch=5, rng=jnp.zeros(2, jnp.uint32))
    )
    assert os.path.isdir(p + ".d")
    names = sorted(os.listdir(p + ".d"))
    assert names == ["e5_head.msgpack", "e5_opt0.msgpack",
                     "e5_opt1.msgpack", "e5_params.msgpack"], names
    r = load_state(p, TrainState(params, (s0, t0), rng=jnp.zeros(2, jnp.uint32)))
    assert r.epoch == 5
    np.testing.assert_array_equal(_mu(r.opt_state[0]), _mu(s1))
    np.testing.assert_array_equal(_mu(r.opt_state[1]), _mu(t1))
    np.testing.assert_array_equal(np.asarray(r.params["w"]),
                                  np.asarray(params["w"]))


def test_sharded_crash_mid_save_keeps_previous(tmp_path):
    """A crash AFTER new parts land but BEFORE the manifest replace must
    leave the previous checkpoint fully loadable (the manifest still names
    the old epoch's parts); the next complete save prunes stale parts."""
    import os

    from summarizer_tpu.train.resume import save_state_sharded

    params, s0, s1 = _setup()
    p = str(tmp_path / "crash.ckpt")
    save_state_sharded(p, TrainState(params, s1, epoch=2,
                                     rng=jnp.zeros(2, jnp.uint32)))
    # Simulate the torn next save: epoch-3 part files exist, manifest not
    # yet replaced.
    import flax.serialization

    for n in ("params", "opt0", "head"):
        with open(os.path.join(p + ".d", f"e3_{n}.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes({"torn": np.zeros(1)}))
    r = load_state(p, TrainState(params, s0, rng=jnp.zeros(2, jnp.uint32)))
    assert r.epoch == 2
    np.testing.assert_array_equal(_mu(r.opt_state), _mu(s1))
    # A completed save prunes everything the new manifest does not name.
    save_state_sharded(p, TrainState(params, s1, epoch=4,
                                     rng=jnp.zeros(2, jnp.uint32)))
    left = sorted(os.listdir(p + ".d"))
    assert all(f.startswith("e4_") for f in left), left


def test_light_flag_round_trip(tmp_path):
    """load_state reports whether the checkpoint carried optimizer state
    (TrainState.light): the engines warn when a params-only fold-complete
    record is resumed INTO (optimizer moments restart)."""
    params, s0, s1 = _setup()
    p_light = str(tmp_path / "l.ckpt")
    save_state(p_light, TrainState(params, s1, epoch=3,
                                   rng=jnp.zeros(2, jnp.uint32)), light=True)
    p_full = str(tmp_path / "f.ckpt")
    save_state(p_full, TrainState(params, s1, epoch=3,
                                  rng=jnp.zeros(2, jnp.uint32)))
    r_light = load_state(p_light, TrainState(params, s0, rng=jnp.zeros(2, jnp.uint32)))
    r_full = load_state(p_full, TrainState(params, s0, rng=jnp.zeros(2, jnp.uint32)))
    assert r_light.light and not r_full.light


def test_final_save_light_opt_in(tmp_path):
    """Engine.maybe_save_state(final=True): FULL state by default; the
    params-only record only under the benchmark sweep's opt-in
    ``resume_final_light`` (its retries never extend epochs).  Both are
    asynchronous — flush_saves() must land them."""
    from summarizer_tpu.train.engine import Engine

    params, s0, s1 = _setup()

    class _Eng:
        hp = {}
    for hp_cfg, expect_light in (({}, False), ({"resume_final_light": 1}, True)):
        eng = _Eng()
        eng.hp = hp_cfg
        p = str(tmp_path / f"final_{expect_light}.ckpt")
        Engine.maybe_save_state(
            eng, p, TrainState(params, s1, epoch=5, rng=jnp.zeros(2, jnp.uint32)),
            force=True, final=True)
        Engine.flush_saves(eng)
        r = load_state(p, TrainState(params, s0, rng=jnp.zeros(2, jnp.uint32)))
        assert r.light == expect_light
        assert r.epoch == 5
        ref = _mu(s1 if not expect_light else s0)
        np.testing.assert_array_equal(_mu(r.opt_state), ref)


def test_sharded_namedtuple_opt_state_not_split(tmp_path):
    """An optax NamedTuple top-level opt_state (tuple subclass) is ONE
    optimizer, not a chain container: save_state_sharded must keep it as a
    single part and the load must reconstruct the NamedTuple type
    (ADVICE r3: isinstance(tuple) would split its fields into bogus
    chains and the reconstruction would raise TypeError)."""
    from summarizer_tpu.train.resume import save_state_sharded

    params, s0, s1 = _setup()
    masked = optax.masked(optax.adam(1e-3), {"w": True})
    m0 = masked.init(params)
    _, m1 = masked.update({"w": jnp.ones((2, 3))}, m0, params)
    assert isinstance(m1, tuple) and type(m1) is not tuple  # NamedTuple
    p = str(tmp_path / "named.ckpt")
    save_state_sharded(
        p, TrainState(params, m1, epoch=4, rng=jnp.zeros(2, jnp.uint32))
    )
    import json

    manifest = json.load(open(p))
    assert manifest["opt_is_tuple"] is False and manifest["n_opt"] == 1
    r = load_state(p, TrainState(params, m0, rng=jnp.zeros(2, jnp.uint32)))
    assert type(r.opt_state) is type(m0)
    np.testing.assert_allclose(_mu(r.opt_state), _mu(m1))


def test_fold_metrics_sidecar_round_trip(tmp_path):
    """Best-metric sidecar: written at fold end, restored on a resume that
    lands at/past the final epoch (ADVICE r3 crash-path metric caveat)."""
    from summarizer_tpu.train.engine import Engine, FoldResult

    class _Hps:
        resume = True

    class _Log:
        def info(self, *a, **k):
            pass

    eng = Engine.__new__(Engine)
    eng.hps = _Hps()
    eng.log = _Log()
    path = str(tmp_path / "state_fold0.ckpt")
    best = [FoldResult(0.41, 0.52, 0.63, None), FoldResult(0.1, 0.2, 0.3, None)]
    eng.save_fold_metrics(path, best)
    rec = eng.load_fold_metrics(path, 2)
    assert rec == [[0.41, 0.52, 0.63], [0.1, 0.2, 0.3]]
    assert eng.load_fold_metrics(path, 5) is None  # fold-count mismatch
    # All-sentinel records are not persisted (nothing real to restore).
    p2 = str(tmp_path / "state_fold1.ckpt")
    eng.save_fold_metrics(p2, [FoldResult(-1.0, 0.0, 0.0, None)])
    assert eng.load_fold_metrics(p2, 1) is None
