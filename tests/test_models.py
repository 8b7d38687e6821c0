"""Registry-wide model contracts: shapes, range, padding invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarizer_tpu.models import REGISTRY

HP = {
    "input_size": 64,
    "hidden_size": 8,
    "sLSTM_hidden_size": 8,
    "edLSTM_hidden_size": 12,
    "cLSTM_hidden_size": 8,
    "encoder_layers": 2,
    "attention_heads": 4,
    "s_attention_heads": 4,
    "ae_attention_heads": 4,
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_abi_shape_and_range(name):
    spec = REGISTRY[name]
    rng = jax.random.PRNGKey(0)
    params = spec.module.init(rng, HP)
    x = jax.random.normal(rng, (3, 16, 64))
    mask = jnp.ones((3, 16)).at[1, 10:].set(0.0).at[2, 5:].set(0.0)
    scores = spec.module.apply(params, x, mask, rng=rng, train=False, hp=HP)
    assert scores.shape == (3, 16)
    s = np.asarray(scores)
    assert np.all(s >= 0) and np.all(s <= 1)
    assert np.all(np.isfinite(s))


@pytest.mark.parametrize("name", sorted(set(REGISTRY) - {"random"}))
def test_padding_invariance(name):
    """Valid-position scores must not change when padding grows — the core
    contract that makes padded batching equivalent to the reference's
    unpadded batch-1 computation."""
    spec = REGISTRY[name]
    rng = jax.random.PRNGKey(1)
    params = spec.module.init(rng, HP)
    t = 12
    x = jax.random.normal(rng, (1, t, 64))
    m = jnp.ones((1, t))
    s_ref = np.asarray(spec.module.apply(params, x, m, rng=rng, train=False, hp=HP))

    pad = 9
    xp = jnp.concatenate([x, jnp.zeros((1, pad, 64))], axis=1)
    mp = jnp.concatenate([m, jnp.zeros((1, pad))], axis=1)
    s_pad = np.asarray(spec.module.apply(params, xp, mp, rng=rng, train=False, hp=HP))
    np.testing.assert_allclose(s_pad[0, :t], s_ref[0], atol=2e-5)


@pytest.mark.parametrize("name", ["vasnet", "transformer"])
@pytest.mark.parametrize("kind", ["simple", "attention"])
def test_pos_embed_params_are_jittable(name, kind):
    """--max_pos params must be valid jit arguments: a string leaf in the
    pytree (the old {"kind": ...} encoding) aborts every compiled program
    that takes params as input (epoch scan, eval, sharded steps)."""
    spec = REGISTRY[name]
    hp = {**HP, "max_pos": 16, "pos_embed": kind}
    params = spec.module.init(jax.random.PRNGKey(2), hp)

    @jax.jit
    def fwd(p, x, m):
        return spec.module.apply(p, x, m, rng=None, train=False, hp=hp)

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 64))
    m = jnp.ones((2, 16))
    out = np.asarray(fwd(params, x, m))
    assert out.shape == (2, 16) and np.all(np.isfinite(out))
