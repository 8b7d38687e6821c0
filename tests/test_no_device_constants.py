"""Lowering must never fetch device-array constants.

A device-resident constant closed over by a jitted function forces lowering
to pull its value back from the device; over the TPU tunnel one such fetch
costs minutes (observed 74-445 s for a single scalar).  This guard lowers
the hot programs while counting ``ArrayImpl._value`` accesses — any nonzero
count means someone created a ``jnp`` array eagerly inside traced code
(use numpy for static constants instead).
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@contextlib.contextmanager
def count_value_fetches():
    import jax._src.array as jarray

    prop = jarray.ArrayImpl._value
    counter = {"n": 0}

    def patched(self):
        counter["n"] += 1
        return prop.fget(self)

    jarray.ArrayImpl._value = property(patched)
    try:
        yield counter
    finally:
        jarray.ArrayImpl._value = prop


def _assert_clean_lowering(traced, what):
    with count_value_fetches() as c:
        traced.lower()
    assert c["n"] == 0, (
        f"{what}: lowering fetched {c['n']} device constant(s) — "
        "a jnp array was created eagerly inside traced code"
    )


@pytest.mark.parametrize("model", ["logistic", "vasnet", "transformer", "dsn"])
def test_supervised_epoch_lowers_without_device_constants(model):
    from summarizer_tpu.models import get_model
    from summarizer_tpu.train.optim import torch_adam
    from summarizer_tpu.train.supervised import make_epoch_fn

    spec = get_model(model)
    hp = {"input_size": 128, "hidden_size": 16, "local": 8}
    params = spec.module.init(jax.random.PRNGKey(0), hp)
    opt = torch_adam(1e-4, 1e-5)
    opt_state = opt.init(params)
    epoch_fn = make_epoch_fn(spec.module.apply, hp, opt, spec.trainable, 1)
    n, t = 4, 32
    args = (
        params,
        opt_state,
        jnp.zeros((n, t, 128)),
        jnp.zeros((n, t)),
        jnp.ones((n, t)),
        jnp.arange(n),
        jax.random.PRNGKey(1),
    )
    _assert_clean_lowering(epoch_fn.trace(*args), f"supervised epoch [{model}]")


def test_reinforce_epoch_lowers_without_device_constants():
    from summarizer_tpu.models import dsn
    from summarizer_tpu.train.optim import torch_adam
    from summarizer_tpu.train.reinforce import ReinforceEngine

    class Stub:
        hp = {"input_size": 128}
        spec = type("S", (), {"module": dsn})
        _cfg = ReinforceEngine._cfg
        make_epoch_impl = ReinforceEngine.make_epoch_impl
        # make_epoch_fn reads batch_size/data_parallel off hps via getattr
        # with defaults; an empty namespace keeps the reference dynamics.
        hps = type("H", (), {})()

    opt = torch_adam(1e-4, 1e-5, clip_norm=5.0)
    params = dsn.init(jax.random.PRNGKey(0), {"input_size": 128})
    epoch_fn = ReinforceEngine.make_epoch_fn(Stub(), opt)
    n, t = 4, 32
    args = (
        params,
        opt.init(params),
        jnp.zeros(n),
        jnp.zeros((n, t, 128)),
        jnp.zeros((n, t)),
        jnp.ones((n, t)),
        jnp.arange(n),
        jax.random.PRNGKey(1),
    )
    _assert_clean_lowering(epoch_fn.trace(*args), "reinforce epoch")


def test_eval_program_lowers_without_device_constants(synth_records):
    from summarizer_tpu.data.batching import eval_static_dims, pack_eval
    from summarizer_tpu.ops.eval_jax import evaluate_batch

    records = synth_records
    s, g, u, f, cap = eval_static_dims(records, 0.15)
    batch, _ = pack_eval(records, s, g, u, f)
    batch = jax.tree.map(jnp.asarray, batch)
    scores = jnp.zeros((len(records), s))

    traced = evaluate_batch.trace(
        scores, batch, proportion=0.15, method="knapsack", max_capacity=cap, out_frames=f
    )
    _assert_clean_lowering(traced, "evaluate_batch")
