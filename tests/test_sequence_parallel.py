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


def test_sp_composes_with_dp():
    """(dp=2, sp=4) mesh: videos sharded over dp, T over sp — halo exchange
    stays within each dp row; output equals the single-device kernel."""
    from jax.sharding import Mesh

    q, k, v, lengths = _qkv(10)
    ref = flash_attention(q, k, v, lengths, None, None, 16, False, 0.0, **BLK)
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "sp"))
    got = sp_attention(
        q, k, v, lengths, mesh, axis="sp", batch_axis="dp", aperture=16, **BLK
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_sp_train_step_matches_dense():
    """One full supervised train step (masked MSE + Adam) with activations
    sequence-sharded equals the unsharded step: loss and updated params."""
    from summarizer_tpu.models import vasnet
    from summarizer_tpu.parallel.sequence_parallel import make_sp_train_step
    from summarizer_tpu.train.optim import torch_adam
    from summarizer_tpu.train.supervised import masked_mse

    import optax

    rng = np.random.RandomState(11)
    hp = {"input_size": D, "local": 16, "pos_embed": None, "flash": 1}
    params = vasnet.init(jax.random.PRNGKey(3), hp)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    tgt = jnp.asarray(rng.rand(B, T), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 100:] = 0.0
    mask = jnp.asarray(mask)
    key = jax.random.PRNGKey(7)
    opt = torch_adam(5e-5, 1e-5)

    def ref_loss(p):
        s = vasnet.apply(p, x, mask, rng=key, train=True, hp=hp)
        return masked_mse(s, tgt, mask)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    upd, _ = opt.update(ref_g, opt.init(params), params)
    ref_params = optax.apply_updates(params, upd)

    mesh = make_sp_mesh(8)
    step, shard_batch, shard_params = make_sp_train_step(hp, opt, mesh)
    sp_params = shard_params(params)
    opt_state = opt.init(sp_params)
    xs, ts, ms = shard_batch(x, tgt, mask)
    sp_params, _, sp_l = step(sp_params, opt_state, xs, ts, ms, key)

    np.testing.assert_allclose(float(sp_l), float(ref_l), atol=1e-6)
    for pa, pb in zip(jax.tree.leaves(sp_params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-6)


def test_sp_transformer_apply_matches_dense():
    """Multi-head sp (heads folded into batch, T all-gather-sharded) equals
    the dense einsum transformer forward."""
    from summarizer_tpu.models import transformer
    from summarizer_tpu.parallel.sequence_parallel import sp_transformer_apply

    rng = np.random.RandomState(12)
    hp = {
        "input_size": D, "encoder_layers": 2, "attention_heads": 4,
        "pos_embed": None, "flash": 0,
    }
    params = transformer.init(jax.random.PRNGKey(4), hp)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 100:] = 0.0
    mask = jnp.asarray(mask)

    ref = transformer.apply(params, x, mask, rng=None, train=False, hp=hp)
    mesh = make_sp_mesh(8)
    got = sp_transformer_apply(
        params, x, mask, mesh=mesh, rng=None, train=False, hp=hp
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_sp_aperture_exceeding_slab_raises():
    q, k, v, lengths = _qkv(4)
    mesh = make_sp_mesh(8)
    with pytest.raises(ValueError, match="aperture"):
        sp_attention(q, k, v, lengths, mesh, aperture=T // 8 + 1, **BLK)
