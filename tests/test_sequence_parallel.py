"""Sequence-parallel attention == single-device kernel, on the virtual mesh.

The sp path (parallel/sequence_parallel.py) must reproduce the single-device
flash kernel exactly: same outputs, same gradients, same in-kernel dropout
pattern (the hash runs in global coordinates), for both the banded
(halo-exchange) and full (all-gather) variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarizer_tpu.ops.flash_attention import flash_attention
from summarizer_tpu.parallel.sequence_parallel import (
    make_sp_mesh,
    sp_attention,
    sp_vasnet_apply,
)

B, T, D = 2, 128, 32
BLK = dict(block_q=16, block_k=16)


def _qkv(seed=0):
    rng = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(rng.randn(B, T, D), jnp.float32) for _ in range(3))
    lengths = jnp.asarray([T, 100], jnp.int32)
    return q, k, v, lengths


def test_sp_banded_matches_single_device():
    q, k, v, lengths = _qkv()
    ref = flash_attention(q, k, v, lengths, None, None, 16, False, 0.0, **BLK)
    mesh = make_sp_mesh(8)
    got = sp_attention(q, k, v, lengths, mesh, aperture=16, **BLK)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_sp_banded_grads_match():
    q, k, v, lengths = _qkv(1)
    w = jnp.asarray(np.random.RandomState(9).randn(B, T, D), jnp.float32)
    mesh = make_sp_mesh(8)

    def loss_ref(q, k, v):
        o = flash_attention(q, k, v, lengths, None, None, 16, True, 0.0, **BLK)
        return jnp.sum(o * w)

    def loss_sp(q, k, v):
        o = sp_attention(q, k, v, lengths, mesh, aperture=16, ignore_self=True, **BLK)
        return jnp.sum(o * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_sp_full_attention_matches():
    q, k, v, lengths = _qkv(2)
    ref = flash_attention(q, k, v, lengths, None, None, None, True, 0.0, **BLK)
    mesh = make_sp_mesh(4)
    got = sp_attention(q, k, v, lengths, mesh, aperture=None, ignore_self=True, **BLK)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_sp_dropout_pattern_is_global():
    """In-kernel dropout hashes GLOBAL (row, col): sharded == single-device
    bit-for-bit, which also proves each shard sees the right coordinates."""
    q, k, v, lengths = _qkv(3)
    seeds = jnp.asarray([7, 11], jnp.int32)
    ref = flash_attention(q, k, v, lengths, seeds, None, 16, False, 0.5, **BLK)
    mesh = make_sp_mesh(8)
    got = sp_attention(
        q, k, v, lengths, mesh, aperture=16, dropout_rate=0.5,
        dropout_seed=seeds, **BLK
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_sp_vasnet_apply_matches_dense():
    from summarizer_tpu.models import vasnet

    rng = np.random.RandomState(5)
    hp = {"input_size": D, "local": 16, "pos_embed": None, "flash": 1}
    params = vasnet.init(jax.random.PRNGKey(0), hp)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 100:] = 0.0
    mask = jnp.asarray(mask)

    ref = vasnet.apply(params, x, mask, rng=None, train=False, hp=hp)
    mesh = make_sp_mesh(8)
    got = sp_vasnet_apply(params, x, mask, mesh=mesh, rng=None, train=False, hp=hp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_sp_vasnet_train_mode_matches():
    """Training forward (attention dropout in-kernel + residual dropouts)
    matches exactly under the same PRNG key."""
    from summarizer_tpu.models import vasnet

    rng = np.random.RandomState(6)
    hp = {"input_size": D, "local": 16, "pos_embed": None, "flash": 1}
    params = vasnet.init(jax.random.PRNGKey(0), hp)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    key = jax.random.PRNGKey(42)

    ref = vasnet.apply(params, x, mask, rng=key, train=True, hp=hp)
    mesh = make_sp_mesh(8)
    got = sp_vasnet_apply(params, x, mask, mesh=mesh, rng=key, train=True, hp=hp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_sp_forward_jitted_sharded():
    """make_sp_forward: jitted, inputs laid out over the mesh, params
    replicated — output matches the unsharded forward."""
    from summarizer_tpu.models import vasnet
    from summarizer_tpu.parallel.sequence_parallel import make_sp_forward

    rng = np.random.RandomState(8)
    hp = {"input_size": D, "local": 16, "pos_embed": None, "flash": 1}
    params = vasnet.init(jax.random.PRNGKey(1), hp)
    x = jnp.asarray(rng.randn(1, T, D), jnp.float32)
    mask = jnp.ones((1, T), jnp.float32)

    ref = vasnet.apply(params, x, mask, rng=None, train=False, hp=hp)
    mesh = make_sp_mesh(8)
    fwd, shard_batch, shard_params = make_sp_forward(hp, mesh)
    xs, ms = shard_batch(x, mask)
    got = fwd(shard_params(params), xs, ms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_sp_aperture_exceeding_slab_raises():
    q, k, v, lengths = _qkv(4)
    mesh = make_sp_mesh(8)
    with pytest.raises(ValueError, match="aperture"):
        sp_attention(q, k, v, lengths, mesh, aperture=T // 8 + 1, **BLK)
