"""Bitwise determinism: same seed -> identical training trajectory.

The functional design (explicit PRNG keys, no host-side RNG in the hot
path, pure scan epochs) makes runs reproducible by construction — the SPMD
analogue of a race-free guarantee.  The reference is non-reproducible (its
shuffles use the unseeded global ``random``, logistic.py:64)."""

import numpy as np
import jax

from summarizer_tpu.data.batching import pack_train
from summarizer_tpu.models import vasnet
from summarizer_tpu.train.optim import torch_adam
from summarizer_tpu.train.supervised import make_epoch_fn


def _train_once(records, seed):
    hp = {"input_size": 64, "local": 8}
    pack = pack_train(records)
    params = vasnet.init(jax.random.PRNGKey(seed), hp)
    opt = torch_adam(1e-3, 1e-5)
    opt_state = opt.init(params)
    epoch_fn = make_epoch_fn(vasnet.apply, hp, opt, True, 1)
    rng = jax.random.PRNGKey(seed)
    n = pack.features.shape[0]
    for _ in range(2):
        rng, k_perm, k_ep = jax.random.split(rng, 3)
        perm = jax.random.permutation(k_perm, n)
        params, opt_state, loss = epoch_fn(
            params, opt_state, pack.features, pack.targets, pack.mask, perm, k_ep
        )
    return jax.device_get(params), float(loss)


def test_same_seed_same_trajectory(synth_records):
    p1, l1 = _train_once(synth_records, 7)
    p2, l2 = _train_once(synth_records, 7)
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_different_seed_differs(synth_records):
    _, l1 = _train_once(synth_records, 7)
    _, l2 = _train_once(synth_records, 8)
    assert l1 != l2
