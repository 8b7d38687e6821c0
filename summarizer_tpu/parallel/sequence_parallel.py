"""Sequence parallelism (context parallelism) over an ICI mesh axis.

A new capability relative to the reference (SURVEY.md §2.4/§5): the
reference's only long-sequence mechanisms are offline 15x frame subsampling
(summarizer/datasets/README.md:46) and VASNet's single-device local
attention aperture (summarizer/models/vasnet.py:124-127).  Here the time
axis of a video is sharded across devices, so a Twitch-LOL-scale (or far
longer) sequence that exceeds one chip's HBM trains and serves across the
slice:

- **banded attention** (aperture ``w``, the reference's best LOL model):
  each shard exchanges an aperture-wide k/v halo with its two mesh
  neighbors via ``lax.ppermute`` (one ICI hop each way), then runs the
  banded Pallas flash kernel (ops/flash_attention.py) on its local rows.
  Per-device compute and HBM traffic are O(T/n * w); comms are O(B * w * D)
  per direction — independent of T.  Gradients flow automatically: AD
  through ``shard_map`` transposes the ppermute, routing halo k/v
  cotangents back to their owner shards.
- **full attention**: k/v are all-gathered over the axis (O(T * D) comms,
  transpose is reduce-scatter); q stays sharded, so the O(T^2) score matrix
  is split n ways in both compute and memory.

The flash kernel receives per-shard global row/col offsets, so length
masking, the band, self-exclusion, and the stateless dropout hash all
evaluate in GLOBAL coordinates — a sharded call reproduces the
single-device kernel's output (and dropout pattern, and gradients) exactly,
which is what the parity tests in tests/test_sequence_parallel.py assert.

Everything here composes with the (dp, tp) mesh in parallel/mesh.py: pass
any mesh and name the axis to shard the sequence over.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from summarizer_tpu.ops.flash_attention import flash_attention


def make_sp_mesh(n_devices: int | None = None, axis: str = "sp") -> Mesh:
    """A 1-D sequence-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (n_devices, len(devices))
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def sp_attention(
    q,
    k,
    v,
    lengths,
    mesh: Mesh,
    *,
    axis: str = "sp",
    batch_axis: str | None = None,
    scale: float | None = None,
    aperture: int | None = None,
    ignore_self: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    block_q: int = 128,
    block_k: int = 128,
):
    """Masked single-head attention with the (B, T, D) inputs sharded over
    ``axis`` on T.  Semantics identical to ``flash_attention`` on one device.

    Callable both outside jit (global arrays; shard_map partitions them) and
    inside a jit whose activations are already sharded P(batch_axis, axis,
    None).  T must divide the axis size; with an aperture, the per-shard slab
    must cover the halo (T/n >= aperture).  ``batch_axis`` additionally
    shards videos over a second mesh axis (dp x sp composition) — halos then
    ride ICI neighbors within each dp row.
    """
    n = mesh.shape[axis]
    b, t, _ = q.shape
    assert t % n == 0, f"sequence length {t} not divisible by sp={n}"
    t_loc = t // n
    if aperture is not None and t_loc < aperture:
        raise ValueError(
            f"aperture {aperture} exceeds the per-shard slab {t_loc} "
            f"(T={t}, sp={n}): halo exchange only reaches mesh neighbors — "
            f"use fewer shards or a smaller aperture"
        )
    if dropout_seed is None:
        dropout_seed = jnp.zeros((b,), jnp.int32)
    if batch_axis is not None:
        assert b % mesh.shape[batch_axis] == 0, (b, mesh.shape[batch_axis])

    fn = partial(
        _sp_local_attention,
        axis=axis, n=n, t_loc=t_loc, scale=scale, aperture=aperture,
        ignore_self=ignore_self, dropout_rate=float(dropout_rate),
        block_q=block_q, block_k=block_k,
    )
    sharded = P(batch_axis, axis, None)
    per_video = P(batch_axis)
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(sharded, sharded, sharded, per_video, per_video),
        out_specs=sharded,
        check_vma=False,
    )
    return mapped(
        q, k, v, lengths.astype(jnp.int32), dropout_seed.astype(jnp.int32)
    )


def _sp_local_attention(
    q_l, k_l, v_l, lengths, seeds,
    *, axis, n, t_loc, scale, aperture, ignore_self, dropout_rate,
    block_q, block_k,
):
    """Per-shard body: local q rows against halo-extended (banded) or
    all-gathered (full) k/v, in global coordinates."""
    b = q_l.shape[0]
    idx = lax.axis_index(axis)
    q_offset = jnp.full((b,), idx * t_loc, jnp.int32)

    if aperture is None:
        # Full attention: every shard needs every key.  all_gather is tiled
        # along T so k/v come back globally indexed (k_offset = 0).
        k_all = lax.all_gather(k_l, axis, axis=1, tiled=True)
        v_all = lax.all_gather(v_l, axis, axis=1, tiled=True)
        return flash_attention(
            q_l, k_all, v_all, lengths, seeds, scale, None, ignore_self,
            dropout_rate, block_q, block_k,
            q_offset=q_offset, k_offset=None, diag_shift=0,
        )

    # Banded attention: only an aperture-wide halo crosses the ICI.  The
    # left halo of shard i is the last `aperture` rows of shard i-1 (a +1
    # cyclic shift); the right halo is the first rows of shard i+1.  Edge
    # shards receive wrapped garbage, which the kernel's global-coordinate
    # mask (cols >= 0, cols < length) discards — and since masked columns
    # contribute zero gradient, the transposed ppermute routes exact zeros
    # back to the wrapped owners.
    halo = int(aperture)
    fwd_perm = [(i, (i + 1) % n) for i in range(n)]
    bwd_perm = [(i, (i - 1) % n) for i in range(n)]
    left_k = lax.ppermute(k_l[:, -halo:], axis, fwd_perm)
    left_v = lax.ppermute(v_l[:, -halo:], axis, fwd_perm)
    right_k = lax.ppermute(k_l[:, :halo], axis, bwd_perm)
    right_v = lax.ppermute(v_l[:, :halo], axis, bwd_perm)
    k_ext = jnp.concatenate([left_k, k_l, right_k], axis=1)
    v_ext = jnp.concatenate([left_v, v_l, right_v], axis=1)
    # Local col 0 of k_ext sits at global position q_offset - halo.
    k_offset = q_offset - halo
    return flash_attention(
        q_l, k_ext, v_ext, lengths, seeds, scale, aperture, ignore_self,
        dropout_rate, block_q, block_k,
        q_offset=q_offset, k_offset=k_offset, diag_shift=halo,
    )


def sp_vasnet_apply(
    params, x, mask, *, mesh: Mesh, axis: str = "sp",
    batch_axis: str | None = None, rng=None, train=False,
    hp: dict | None = None,
):
    """VASNet forward with attention sequence-parallel over ``mesh[axis]``.

    Drop-in for models.vasnet.apply: everything outside attention (the
    projections, LayerNorms, FFN head) is frame-local, so under a jit with
    x sharded P(batch_axis, axis, None) GSPMD keeps those sharded on T with
    no communication; only the attention itself exchanges halos / gathers
    keys via the shard_map above.
    """
    from summarizer_tpu.models import vasnet

    override = partial(sp_attention, mesh=mesh, axis=axis, batch_axis=batch_axis)

    def attention_fn(q, k, v, lengths, seeds, scale, aperture, ignore_self,
                     dropout_rate):
        return override(
            q, k, v, lengths, scale=scale, aperture=aperture,
            ignore_self=ignore_self, dropout_rate=dropout_rate,
            dropout_seed=seeds,
        )

    hp = {**(hp or {}), "attention_override": attention_fn, "flash": 1}
    return vasnet.apply(params, x, mask, rng=rng, train=train, hp=hp)


def sp_transformer_apply(
    params, x, mask, *, mesh: Mesh, axis: str = "sp",
    batch_axis: str | None = None, rng=None, train=False,
    hp: dict | None = None,
):
    """Transformer-encoder scorer forward with every layer's self-attention
    sequence-parallel over ``mesh[axis]``.

    The MHA layer folds heads into the batch axis ((B*H, T, hd),
    nn/attention.py), so the same sp_attention shards T for all heads at
    once via one all-gather of k/v per layer; the FFNs/LayerNorms stay
    frame-local and shard on T under GSPMD.
    """
    from summarizer_tpu.models import transformer

    def attention_fn(q, k, v, lengths, seeds, scale, dropout_rate):
        return sp_attention(
            q, k, v, lengths, mesh, axis=axis, batch_axis=batch_axis,
            scale=scale, aperture=None, dropout_rate=dropout_rate,
            dropout_seed=seeds,
        )

    hp = {**(hp or {}), "attention_override": attention_fn}
    return transformer.apply(params, x, mask, rng=rng, train=train, hp=hp)


def make_sp_forward(hp: dict, mesh: Mesh, axis: str = "sp",
                    batch_axis: str | None = None):
    """Jitted sequence-sharded VASNet forward: returns (fwd, shard_batch,
    shard_params).

    ``fwd(params, x, mask)`` expects x (B, T, D) / mask (B, T) laid out over
    the mesh via ``shard_batch``; params replicate.  T must be a multiple of
    the axis size (serving buckets already are — serve.py pads to 128s).
    With ``batch_axis``, videos shard over a second mesh axis (dp x sp).
    """
    x_sh = NamedSharding(mesh, P(batch_axis, axis, None))
    m_sh = NamedSharding(mesh, P(batch_axis, axis))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def fwd(params, x, mask):
        return sp_vasnet_apply(
            params, x, mask, mesh=mesh, axis=axis, batch_axis=batch_axis,
            rng=None, train=False, hp=hp,
        )

    def shard_batch(x, mask):
        return jax.device_put(x, x_sh), jax.device_put(mask, m_sh)

    def shard_params(params):
        return jax.device_put(params, jax.tree.map(lambda _: repl, params))

    return fwd, shard_batch, shard_params


def make_sp_train_step(hp: dict, optimizer, mesh: Mesh, axis: str = "sp",
                       batch_axis: str | None = None):
    """Jitted supervised train step with activations sequence-sharded.

    Same masked-MSE/Adam semantics as the dense step
    (train/supervised.py): the per-video loss mean reduces over the sharded
    T axis (a psum GSPMD emits), grads of the replicated params arrive via
    the transposed collectives.  Returns (step, shard_batch, shard_params).
    """
    import optax

    from summarizer_tpu.train.supervised import masked_mse

    x_sh = NamedSharding(mesh, P(batch_axis, axis, None))
    m_sh = NamedSharding(mesh, P(batch_axis, axis))
    repl = NamedSharding(mesh, P())

    def loss_fn(params, x, t, m, rng):
        scores = sp_vasnet_apply(
            params, x, m, mesh=mesh, axis=axis, batch_axis=batch_axis,
            rng=rng, train=True, hp=hp,
        )
        return masked_mse(scores, t, m)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, t, m, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, t, m, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_batch(x, targets, mask):
        return (
            jax.device_put(x, x_sh),
            jax.device_put(targets, m_sh),
            jax.device_put(mask, m_sh),
        )

    def shard_params(params):
        return jax.device_put(params, jax.tree.map(lambda _: repl, params))

    return step, shard_batch, shard_params
