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
    got = flash_attention(q, k, v, lengths, None, None, aperture, ignore_self)
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
        o = flash_attention(q, k, v, lengths, None, None, aperture, False)
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


def test_flash_dropout_matches_dense_hash_oracle():
    """In-kernel dropout == dense attention with the same stateless hash
    mask: forward AND gradients (VERDICT r1 item 7)."""
    import jax
    import jax.numpy as jnp

    from summarizer_tpu.ops.flash_attention import dropout_keep, flash_attention

    rng = np.random.RandomState(5)
    b, t, d = 2, 70, 32
    rate = 0.5
    q = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    lengths = jnp.asarray([t, t - 17], jnp.int32)
    seeds = jnp.asarray([101, 202], jnp.int32)
    g = jnp.asarray(rng.randn(b, t, d), jnp.float32)

    def dense(q, k, v):
        ij = np.arange(t)
        outs = []
        for i in range(b):
            logits = (q[i] @ k[i].T) / np.sqrt(d)
            valid = (ij[None, :] < int(lengths[i]))
            logits = jnp.where(valid, logits, -1e30)
            att = jax.nn.softmax(logits, axis=-1)
            keep = dropout_keep(
                jnp.asarray(ij[:, None] * np.ones((1, t), np.int32)),
                jnp.asarray(np.ones((t, 1), np.int32) * ij[None, :]),
                int(seeds[i]), rate,
            )
            att = att * keep / (1.0 - rate)
            outs.append(att @ v[i])
        return jnp.stack(outs)

    def flash(q, k, v):
        return flash_attention(q, k, v, lengths, seeds, None, None, False, rate)

    o_d = dense(q, k, v)
    o_f = flash(q, k, v)
    # padded-row outputs are irrelevant; compare valid rows
    for i in range(b):
        n = int(lengths[i])
        np.testing.assert_allclose(o_f[i, :n], o_d[i, :n], atol=1e-4)

    def loss(fn, q, k, v):
        out = fn(q, k, v)
        m = (np.arange(t)[None, :, None] < np.asarray(lengths)[:, None, None])
        return jnp.sum(out * g * m)

    gd = jax.grad(lambda *a: loss(dense, *a), argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(lambda *a: loss(flash, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gd, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=2e-4)


def test_flash_dropout_rate_and_determinism():
    from summarizer_tpu.ops.flash_attention import dropout_keep, flash_attention
    import jax.numpy as jnp

    rows = jnp.asarray(np.arange(256)[:, None] * np.ones((1, 256), np.int32))
    cols = jnp.asarray(np.ones((256, 1), np.int32) * np.arange(256)[None, :])
    keep = np.asarray(dropout_keep(rows, cols, 7, 0.5))
    frac = keep.mean()
    assert 0.45 < frac < 0.55, frac
    # determinism / seed sensitivity
    k2 = np.asarray(dropout_keep(rows, cols, 7, 0.5))
    k3 = np.asarray(dropout_keep(rows, cols, 8, 0.5))
    assert (keep == k2).all()
    assert (keep != k3).any()


def test_mha_flash_matches_dense():
    """Multi-head flash (heads folded into batch) == dense einsum MHA:
    forward and full-parameter gradients, masked batch."""
    from summarizer_tpu.nn.attention import mha_apply, mha_init

    rng = np.random.RandomState(3)
    b, t, d, heads = 2, 256, 256, 2  # hd = 128 (lane-aligned)
    x = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    lengths = jnp.asarray([256, 171], jnp.int32)
    mask = (jnp.arange(t)[None] < lengths[:, None]).astype(jnp.float32)
    p = mha_init(jax.random.PRNGKey(0), d)

    yf = mha_apply(p, x, x, x, heads, mask, flash=True)
    yd = mha_apply(p, x, x, x, heads, mask, flash=False)
    valid = np.broadcast_to(np.asarray(mask)[..., None] > 0, yf.shape)
    assert np.abs(np.asarray(yf) - np.asarray(yd))[valid].max() < 1e-4

    def loss(p, flash):
        y = mha_apply(p, x, x, x, heads, mask, flash=flash)
        return jnp.sum((y * mask[..., None]) ** 2)

    gf = jax.grad(lambda p: loss(p, True))(p)
    gd = jax.grad(lambda p: loss(p, False))(p)
    for kp, a in jax.tree_util.tree_leaves_with_path(gf):
        bref = {jax.tree_util.keystr(kp2): v
                for kp2, v in jax.tree_util.tree_leaves_with_path(gd)}[
                    jax.tree_util.keystr(kp)]
        scale = max(1.0, float(np.abs(np.asarray(bref)).max()))
        assert np.abs(np.asarray(a) - np.asarray(bref)).max() / scale < 2e-4, (
            jax.tree_util.keystr(kp))


def test_transformer_flash_matches_dense():
    """Transformer scorer, flash=1 vs flash=0 (eval mode): scores agree."""
    from summarizer_tpu.models import transformer

    rng = np.random.RandomState(4)
    b, t, d = 2, 256, 256
    hp = {"input_size": d, "encoder_layers": 2, "attention_heads": 2}
    x = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    lengths = jnp.asarray([256, 200], jnp.int32)
    mask = (jnp.arange(t)[None] < lengths[:, None]).astype(jnp.float32)
    params = transformer.init(jax.random.PRNGKey(1), hp)
    sf = transformer.apply(params, x, mask, train=False, hp={**hp, "flash": 1})
    sd = transformer.apply(params, x, mask, train=False, hp={**hp, "flash": 0})
    valid = np.asarray(mask) > 0
    assert np.abs(np.asarray(sf) - np.asarray(sd))[valid].max() < 1e-4
