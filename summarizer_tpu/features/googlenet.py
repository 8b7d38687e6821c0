"""GoogLeNet (Inception v1) pool5 feature tower in JAX.

Produces the 1024-d pool5 descriptor the datasets were built from
(datasets/README.md:46).  Layer/channel layout and BatchNorm placement follow
torchvision's ``googlenet`` (BasicConv2d = conv + BN(eps=1e-3) + ReLU;
3x3 convs in the "5x5" branch), so ImageNet weights exported from a
torchvision state_dict load directly via ``load_torch_state_dict`` —
no torch needed at inference time.

All convs run NHWC so XLA tiles them onto the MXU; inference BN is folded
into a scale/shift (one fused multiply-add after each conv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# (branch1, b2_reduce, b2, b3_reduce, b3, b4_pool_proj) per inception block
_INCEPTION = {
    "3a": (192, 64, 96, 128, 16, 32, 32),
    "3b": (256, 128, 128, 192, 32, 96, 64),
    "4a": (480, 192, 96, 208, 16, 48, 64),
    "4b": (512, 160, 112, 224, 24, 64, 64),
    "4c": (512, 128, 128, 256, 24, 64, 64),
    "4d": (512, 112, 144, 288, 32, 64, 64),
    "4e": (528, 256, 160, 320, 32, 128, 128),
    "5a": (832, 256, 160, 320, 32, 128, 128),
    "5b": (832, 384, 192, 384, 48, 128, 128),
}


def _conv_init(rng, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    w = jax.random.truncated_normal(rng, -2, 2, (kh, kw, cin, cout)) * np.sqrt(
        2.0 / fan_in
    )
    # Inference-folded BatchNorm: y = conv(x) * scale + shift
    return {
        "w": w.astype(jnp.float32),
        "scale": jnp.ones((cout,), jnp.float32),
        "shift": jnp.zeros((cout,), jnp.float32),
    }


def _conv(p, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(y * p["scale"] + p["shift"])


def _maxpool(x, k=3, stride=2, padding="SAME"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), padding
    )


def _inception_init(rng, spec):
    cin, b1, b2r, b2, b3r, b3, b4 = spec
    k = jax.random.split(rng, 6)
    return {
        "b1": _conv_init(k[0], 1, 1, cin, b1),
        "b2a": _conv_init(k[1], 1, 1, cin, b2r),
        "b2b": _conv_init(k[2], 3, 3, b2r, b2),
        "b3a": _conv_init(k[3], 1, 1, cin, b3r),
        "b3b": _conv_init(k[4], 3, 3, b3r, b3),  # torchvision uses 3x3 here
        "b4": _conv_init(k[5], 1, 1, cin, b4),
    }


def _inception(p, x):
    b1 = _conv(p["b1"], x)
    b2 = _conv(p["b2b"], _conv(p["b2a"], x))
    b3 = _conv(p["b3b"], _conv(p["b3a"], x))
    b4 = _conv(p["b4"], _maxpool(x, 3, 1))
    return jnp.concatenate([b1, b2, b3, b4], axis=-1)


def googlenet_init(rng):
    keys = jax.random.split(rng, 3 + len(_INCEPTION))
    params = {
        "conv1": _conv_init(keys[0], 7, 7, 3, 64),
        "conv2": _conv_init(keys[1], 1, 1, 64, 64),
        "conv3": _conv_init(keys[2], 3, 3, 64, 192),
    }
    for i, (name, spec) in enumerate(_INCEPTION.items()):
        params[f"inception{name}"] = _inception_init(keys[3 + i], spec)
    return params


def googlenet_apply(params, x):
    """(B, 224, 224, 3) float images in [0, 1] -> (B, 1024) pool5 features."""
    # torchvision transform_input normalization baked in.
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (x - mean) / std

    # conv1: torchvision pads 3 on BOTH sides (Conv2d(..., padding=3)); XLA
    # SAME at 224/stride-2 would pad (2, 3) and shift the grid by a pixel.
    x = _conv(params["conv1"], x, stride=2, padding=((3, 3), (3, 3)))  # 112
    x = _maxpool(x)  # 56
    x = _conv(params["conv2"], x)
    x = _conv(params["conv3"], x)
    x = _maxpool(x)  # 28
    x = _inception(params["inception3a"], x)
    x = _inception(params["inception3b"], x)
    x = _maxpool(x)  # 14
    for name in ("4a", "4b", "4c", "4d", "4e"):
        x = _inception(params[f"inception{name}"], x)
    x = _maxpool(x, k=2, padding="VALID")  # 7 (torchvision maxpool4 is 2x2)
    x = _inception(params["inception5a"], x)
    x = _inception(params["inception5b"], x)
    return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 1024)


# ---------------------------------------------------------- weight conversion
_TV_BLOCKS = {
    "conv1": "conv1",
    "conv2": "conv2",
    "conv3": "conv3",
    **{f"inception{n}": f"inception{n}" for n in _INCEPTION},
}
_TV_BRANCH = {
    "b1": "branch1",
    "b2a": "branch2.0",
    "b2b": "branch2.1",
    "b3a": "branch3.0",
    "b3b": "branch3.1",
    "b4": "branch4.1",
}


def _fold_bn(conv_w, bn_g, bn_b, bn_mean, bn_var, eps=1e-3):
    scale = bn_g / np.sqrt(bn_var + eps)
    return scale.astype(np.float32), (bn_b - bn_mean * scale).astype(np.float32)


def load_torch_state_dict(state_dict: dict):
    """Convert a torchvision ``googlenet`` state_dict (tensors or numpy
    arrays) into this module's param pytree, folding BN into scale/shift."""

    def arr(key):
        v = state_dict[key]
        return v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)

    def conv_entry(prefix):
        w = arr(f"{prefix}.conv.weight")  # (O, I, H, W)
        scale, shift = _fold_bn(
            w,
            arr(f"{prefix}.bn.weight"),
            arr(f"{prefix}.bn.bias"),
            arr(f"{prefix}.bn.running_mean"),
            arr(f"{prefix}.bn.running_var"),
        )
        return {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # -> HWIO
            "scale": jnp.asarray(scale),
            "shift": jnp.asarray(shift),
        }

    params = {}
    for ours, theirs in _TV_BLOCKS.items():
        if ours.startswith("inception"):
            params[ours] = {
                b: conv_entry(f"{theirs}.{tv}") for b, tv in _TV_BRANCH.items()
            }
        else:
            params[ours] = conv_entry(theirs)
    return params


def load_npz(path: str):
    """Load weights exported by scripts/export_googlenet_weights.py (a
    torchvision state_dict saved as npz, BN unfused) into the param pytree."""
    with np.load(path) as z:
        return load_torch_state_dict(dict(z.items()))


def fabricate_state_dict(seed: int = 1) -> dict:
    """A torchvision-googlenet-shaped state_dict with random values, in the
    exact key layout the export script writes.  Used by the export selftest
    and tests to validate the full export -> load -> apply chain offline
    (real ImageNet values require one torchvision download; see
    scripts/export_googlenet_weights.py)."""
    rng = np.random.RandomState(seed)
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
