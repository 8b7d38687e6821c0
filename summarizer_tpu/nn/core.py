"""Core layers and initializers (torch-distribution-equivalent)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- initializers
def _uniform(rng, shape, bound):
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def xavier_uniform(rng, shape, gain: float = 1.0):
    """torch.nn.init.xavier_uniform_: U(±gain * sqrt(6/(fan_in+fan_out))).
    ``shape`` is (in, out); torch stores (out, in) but the bound is symmetric."""
    fan_in, fan_out = shape[0], shape[1]
    return _uniform(rng, shape, gain * math.sqrt(6.0 / (fan_in + fan_out)))


def kaiming_uniform(rng, shape, a: float = 0.0):
    """torch.nn.init.kaiming_uniform_ (fan_in, leaky_relu)."""
    fan_in = shape[0]
    gain = math.sqrt(2.0 / (1.0 + a * a))
    return _uniform(rng, shape, gain * math.sqrt(3.0 / fan_in))


def torch_linear_weight(rng, shape):
    """nn.Linear's default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    return kaiming_uniform(rng, shape, a=math.sqrt(5.0))


# --------------------------------------------------------------------- linear
def linear_init(rng, in_dim, out_dim, bias=True, w_init="torch", gain=1.0):
    """w stored (in, out) so apply is a single MXU-friendly ``x @ w``."""
    kw, kb = jax.random.split(rng)
    if w_init == "torch":
        w = torch_linear_weight(kw, (in_dim, out_dim))
    elif w_init == "xavier":
        w = xavier_uniform(kw, (in_dim, out_dim), gain)
    elif w_init == "kaiming":
        w = kaiming_uniform(kw, (in_dim, out_dim))
    elif w_init == "zeros":
        w = jnp.zeros((in_dim, out_dim), jnp.float32)
    else:
        raise KeyError(w_init)
    p = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(in_dim)
        p["b"] = _uniform(kb, (out_dim,), bound)
    return p


def linear(p, x):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    return y + p["b"] if "b" in p else y


# ----------------------------------------------------------------- layer norm
def layer_norm_init(dim):
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p, x, eps: float = 1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


# ------------------------------------------------------------------ embedding
def embedding_init(rng, num, dim):
    """torch.nn.Embedding default: N(0, 1)."""
    return {"table": jax.random.normal(rng, (num, dim), jnp.float32)}


def embedding(p, idx):
    return p["table"][idx]


def sinusoid_pos_embed(max_len: int, dim: int) -> np.ndarray:
    """The reference's hand-rolled sin/cos table (summarizer/models/
    vasnet.py:43-48): sin at even columns, cos at odd, with its particular
    exponent convention (2i/dim for sin, 2(i+1)/dim for cos)."""
    pe = np.zeros((max_len, dim), np.float32)
    pos = np.arange(max_len)[:, None].astype(np.float64)
    i = np.arange(0, dim, 2).astype(np.float64)
    pe[:, 0::2] = np.sin(pos / (10000.0 ** (2 * i / dim)))
    pe[:, 1::2] = np.cos(pos / (10000.0 ** (2 * (i + 1) / dim)))
    return pe


# -------------------------------------------------------------------- dropout
def _key_seed(rng):
    """Fold a PRNG key (raw uint32[2] or typed) into one uint32 seed without
    running the threefry core."""
    if jax.dtypes.issubdtype(jnp.result_type(rng), jax.dtypes.prng_key):
        data = jax.random.key_data(rng)
    else:
        data = jnp.asarray(rng)
    data = data.reshape(-1).astype(jnp.uint32)
    return data[0] ^ (data[1] * np.uint32(0x9E3779B9))


def hash_keep(idx, seed, rate: float):
    """Deterministic Bernoulli(1-rate) keep mask from element indices: the
    murmur3 finalizer over (idx, seed) — the same construction the Pallas
    flash kernel uses in-kernel (ops/flash_attention.py::dropout_keep).
    ~10 VPU ops/element vs. the threefry core's hundreds: the three
    (B, T, *)-sized dropout sites in an attention scorer cost ~40% of the
    train step under jax.random.bernoulli (BENCH_NOTES 'Dense/flash
    crossover') and ~nothing under this hash.  Top 24 bits -> U[0, 1).

    Statistical quality is pinned by tests/test_hash_dropout_stats.py
    (bias, uniformity, serial/cross-seed correlation, calibration vs
    threefry).  Known limits: the 32-bit seed space can birthday-collide
    after ~2^16 steps (one repeated mask — harmless for dropout), and two
    sites passed the SAME key and shape share a mask (model code always
    splits per site)."""
    h = idx.astype(jnp.uint32) * np.uint32(0x9E3779B1)
    h = h ^ (seed * np.uint32(0xC2B2AE3D))
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h >> 8).astype(jnp.int32) >= np.int32(int(rate * (1 << 24)))


def dropout(rng, x, rate: float, train: bool):
    """Inverted dropout; identity when eval or rate == 0.

    Reference semantics (torch.nn.Dropout: i.i.d. Bernoulli keep, 1/(1-p)
    scaling) with a stateless hash mask instead of a counter-based PRNG —
    the marginal distribution is identical, the bit pattern is not torch's
    (no dropout pattern is contractual; lockstep parity runs disable it)."""
    if not train or rate <= 0.0:
        return x
    idx = jax.lax.iota(jnp.uint32, x.size).reshape(x.shape)
    keep = hash_keep(idx, _key_seed(rng), rate)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
