"""Pallas flash attention vs the dense XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarizer_tpu.ops.flash_attention import flash_attention


def dense_ref(q, k, v, lengths, scale, aperture, ignore_self):
    t = q.shape[1]
    s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    cols = jnp.arange(t)
    mask = cols[None, None, :] < lengths[:, None, None]
    if aperture is not None:
        mask = mask & (jnp.abs(cols[:, None] - cols[None, :]) <= aperture)[None]
    if ignore_self:
        mask = mask & ~jnp.eye(t, dtype=bool)[None]
    p = jax.nn.softmax(jnp.where(mask, s, -1e30), axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    b, t, d = 2, 384, 128
    q, k, v = (jnp.asarray(rng.randn(b, t, d), jnp.float32) for _ in range(3))
    lengths = jnp.asarray([384, 301], jnp.int32)
    return q, k, v, lengths


@pytest.mark.parametrize(
    "aperture,ignore_self", [(None, False), (20, False), (150, True)]
)
def test_forward_matches_dense(qkv, aperture, ignore_self):
    q, k, v, lengths = qkv
    d = q.shape[-1]
    got = flash_attention(q, k, v, lengths, None, aperture, ignore_self)
    want = dense_ref(q, k, v, lengths, 1.0 / np.sqrt(d), aperture, ignore_self)
    t = q.shape[1]
    valid = np.broadcast_to(
        np.asarray(jnp.arange(t)[None] < lengths[:, None])[..., None], got.shape
    )
    assert np.abs(np.asarray(got) - np.asarray(want))[valid].max() < 1e-5


@pytest.mark.parametrize("aperture", [None, 20])
def test_gradients_match_dense(qkv, aperture):
    q, k, v, lengths = qkv
    t, d = q.shape[1], q.shape[-1]
    m = (jnp.arange(t)[None] < lengths[:, None])[..., None]

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, lengths, None, aperture, False)
        return jnp.sum(jnp.where(m, o, 0.0) ** 2)

    def loss_dense(q, k, v):
        o = dense_ref(q, k, v, lengths, 1.0 / np.sqrt(d), aperture, False)
        return jnp.sum(jnp.where(m, o, 0.0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4


def test_vasnet_flash_path_matches_dense(qkv):
    """vasnet with flash=1 (eval) == flash=0, including aperture."""
    from summarizer_tpu.models import vasnet

    q, _, _, lengths = qkv
    x = q
    hp = {"input_size": x.shape[-1], "local": 30}
    params = vasnet.init(jax.random.PRNGKey(0), hp)
    mask = (jnp.arange(x.shape[1])[None] < lengths[:, None]).astype(jnp.float32)
    s_flash = vasnet.apply(params, x, mask, train=False, hp={**hp, "flash": 1})
    s_dense = vasnet.apply(params, x, mask, train=False, hp={**hp, "flash": 0})
    valid = np.asarray(mask) > 0
    assert (
        np.abs(np.asarray(s_flash) - np.asarray(s_dense))[valid].max() < 1e-5
    )
