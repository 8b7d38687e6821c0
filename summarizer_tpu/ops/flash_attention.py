"""Blockwise (flash-style) masked attention as a Pallas TPU kernel.

Single-head attention with the mask family VASNet needs (summarizer/models/
vasnet.py:118-133): key-padding by true length, optional *local attention
aperture* |i-j| <= w (the reference's long-sequence mechanism, the best
model on Twitch-LOL per Summarizer.pdf §4.2), and optional self-exclusion.

Why Pallas: the dense XLA path materializes the (T, T) logits; for LOL-scale
T (~4k steps) a 30 s aperture touches ~3% of that matrix.  With an aperture,
the *grid itself* enumerates only the k blocks inside each q block's band
(and vice versa in the backward), so out-of-band blocks are neither fetched
from HBM nor computed: banded attention costs O(T * w) time AND bandwidth
instead of O(T^2).  Running max/sum streaming means logits never hit HBM.
Backward is the standard flash recomputation (saved logsumexp + delta).

In-kernel attention dropout (VASNet trains with dropout 0.5 on the attention
matrix by default, vasnet.py:129-135): the keep mask is a *stateless hash* of
(global row, global col, per-video seed) — a murmur3 finalizer evaluated on
the VPU inside every kernel — so forward and both backward kernels reproduce
the identical mask with no PRNG state, no mask materialization in HBM, and no
dependence on grid iteration order.  Torch semantics: softmax first, then
dropout with 1/(1-rate) scaling — the softmax denominator is built from
UNdropped probabilities.  Interpret mode keeps all of it testable on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _overlap(qb, kb, block_q, block_k, aperture, shift):
    """Does k block kb intersect q block qb's |i-j| <= aperture band?

    ``shift`` is the static diagonal offset between the q and k index
    spaces (sequence parallelism places local k row 0 at global position
    q_offset - shift): local band is rows - cols + shift in [-w, w].
    """
    q_lo = qb * block_q + shift
    k_lo = kb * block_k
    return (k_lo <= q_lo + block_q - 1 + aperture) & (
        k_lo + block_k - 1 >= q_lo - aperture
    )


def _first_kb(qb, block_q, block_k, aperture, shift):
    return jnp.maximum(qb * block_q + shift - aperture, 0) // block_k


def _first_qb(kb, block_q, block_k, aperture, shift):
    return jnp.maximum(kb * block_k - shift - aperture, 0) // block_q


def _n_band_blocks(block_a, block_b, aperture):
    """Static bound on how many b-blocks one a-block's band can touch."""
    return (block_a + 2 * aperture) // block_b + 2


def _mask_for(rows, cols, length, aperture, ignore_self):
    """Validity mask in GLOBAL coordinates: rows/cols already include any
    sequence-parallel shard offsets, so ``cols >= 0`` drops the left-edge
    halo wrap and ``cols < length`` drops both padding and the right-edge
    halo wrap."""
    mask = (cols < length) & (cols >= 0)
    if aperture is not None:
        mask &= jnp.abs(rows - cols) <= aperture
    if ignore_self:
        mask &= rows != cols
    return mask


def dropout_keep(rows, cols, seed, rate: float):
    """Deterministic keep mask: murmur3-finalizer hash of (row, col, seed).

    Stateless, so the forward and both backward kernels regenerate the exact
    same mask from their own (rows, cols) tiles regardless of grid order;
    also used by tests to build the dense oracle.  Top 24 bits -> U[0, 1).
    """
    import numpy as _np

    h = rows.astype(jnp.uint32) * _np.uint32(0x9E3779B1) + cols.astype(
        jnp.uint32
    ) * _np.uint32(0x85EBCA77)
    h = h ^ (jnp.uint32(seed) * _np.uint32(0xC2B2AE3D))
    h = h ^ (h >> 16)
    h = h * _np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    # Compare in the integer domain (Mosaic has no uint32->f32 cast): keep
    # iff the top 24 bits land at/above rate * 2^24.
    bits = jax.lax.bitcast_convert_type((h >> 8), jnp.int32)  # < 2^24, sign-safe
    return bits >= _np.int32(int(rate * (1 << 24)))


# ------------------------------------------------------------------- forward
def _fwd_kernel(
    len_ref, seed_ref, qoff_ref, koff_ref,
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, block_q, block_k, aperture, ignore_self, nk_total, dropout_rate,
    diag_shift,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if aperture is None:
        live = jnp.bool_(True)
        kb = ki
    else:
        kb = _first_kb(qi, block_q, block_k, aperture, diag_shift) + ki
        live = (kb < nk_total) & _overlap(
            qi, kb, block_q, block_k, aperture, diag_shift
        )

    @pl.when(live)
    def _compute():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK)
        rows = qoff_ref[0, 0, 0] + qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0
        )
        cols = koff_ref[0, 0, 0] + kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        mask = _mask_for(rows, cols, len_ref[0, 0, 0], aperture, ignore_self)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        # softmax-then-dropout: the normalizer l uses UNdropped p (torch
        # semantics); only the value accumulation sees the keep mask.
        if dropout_rate > 0.0:
            keep = dropout_keep(rows, cols, seed_ref[0, 0, 0], dropout_rate)
            pv = p * keep.astype(jnp.float32)
        else:
            pv = p
        l_scr[:] = corr * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot(
            pv, v_ref[0], preferred_element_type=jnp.float32
        )
        m_scr[:] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:]
        safe = jnp.where(l > 0, l, 1.0)
        inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
        o_ref[0] = jnp.where(l > 0, acc_scr[:] / safe * inv_keep, 0.0)
        lse_ref[0] = jnp.where(l > 0, m_scr[:] + jnp.log(safe), NEG_INF)


# ------------------------------------------------------------------ backward
def _bwd_kv_kernel(
    len_ref, seed_ref, qoff_ref, koff_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale, block_q, block_k, aperture, ignore_self, nq_total, dropout_rate,
    diag_shift,
):
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    if aperture is None:
        live = jnp.bool_(True)
        qb = qi
    else:
        qb = _first_qb(ki, block_q, block_k, aperture, diag_shift) + qi
        live = (qb < nq_total) & _overlap(
            qb, ki, block_q, block_k, aperture, diag_shift
        )

    @pl.when(live)
    def _compute():
        q = q_ref[0]
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK)
        rows = qoff_ref[0, 0, 0] + qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0
        )
        cols = koff_ref[0, 0, 0] + ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        mask = _mask_for(rows, cols, len_ref[0, 0, 0], aperture, ignore_self)
        p = jnp.where(mask, jnp.exp(s - lse_ref[0]), 0.0)
        do = do_ref[0]
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if dropout_rate > 0.0:
            ks = dropout_keep(rows, cols, seed_ref[0, 0, 0], dropout_rate).astype(
                jnp.float32
            ) * (1.0 / (1.0 - dropout_rate))
            pv = p * ks
            dp = dp * ks
        else:
            pv = p
        dv_scr[:] += jax.lax.dot_general(
            pv, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_ref[0]) * scale
        dk_scr[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:]
        dv_ref[0] = dv_scr[:]


def _bwd_q_kernel(
    len_ref, seed_ref, qoff_ref, koff_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, scale, block_q, block_k, aperture, ignore_self, nk_total, dropout_rate,
    diag_shift,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    if aperture is None:
        live = jnp.bool_(True)
        kb = ki
    else:
        kb = _first_kb(qi, block_q, block_k, aperture, diag_shift) + ki
        live = (kb < nk_total) & _overlap(
            qi, kb, block_q, block_k, aperture, diag_shift
        )

    @pl.when(live)
    def _compute():
        k = k_ref[0]
        s = jax.lax.dot_general(
            q_ref[0], k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        rows = qoff_ref[0, 0, 0] + qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0
        )
        cols = koff_ref[0, 0, 0] + kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        mask = _mask_for(rows, cols, len_ref[0, 0, 0], aperture, ignore_self)
        p = jnp.where(mask, jnp.exp(s - lse_ref[0]), 0.0)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            ks = dropout_keep(rows, cols, seed_ref[0, 0, 0], dropout_rate).astype(
                jnp.float32
            ) * (1.0 / (1.0 - dropout_rate))
            dp = dp * ks
        ds = p * (dp - delta_ref[0]) * scale
        dq_scr[:] += jax.lax.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:]


# ------------------------------------------------------------------ plumbing
def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _k_index_map(block_q, block_k, aperture, nk_total, shift):
    """k/v block index map for a banded (qi-relative) k grid axis."""
    if aperture is None:
        return lambda bi, qi, ki: (bi, ki, 0)

    def imap(bi, qi, ki):
        kb = _first_kb(qi, block_q, block_k, aperture, shift) + ki
        return (bi, jnp.minimum(kb, nk_total - 1), 0)

    return imap


def _q_index_map(block_q, block_k, aperture, nq_total, shift):
    """q-side index maps for the dkv kernel's banded q grid axis."""
    if aperture is None:
        return (
            lambda bi, ki, qi: (bi, qi, 0),
            lambda bi, ki, qi: (bi, qi, 0),
        )

    def imap3(bi, ki, qi):
        qb = _first_qb(ki, block_q, block_k, aperture, shift) + qi
        return (bi, jnp.minimum(qb, nq_total - 1), 0)

    def imap2(bi, ki, qi):
        qb = _first_qb(ki, block_q, block_k, aperture, shift) + qi
        return (bi, jnp.minimum(qb, nq_total - 1), 0)

    return imap3, imap2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 13))
def flash_attention(
    q,
    k,
    v,
    lengths,
    dropout_seed=None,
    scale: float | None = None,
    aperture: int | None = None,
    ignore_self: bool = False,
    dropout_rate: float = 0.0,
    block_q: int = 128,
    block_k: int = 128,
    q_offset=None,
    k_offset=None,
    diag_shift: int = 0,
):
    """softmax(mask(q @ k^T * scale)) [-> dropout] @ v, blockwise.

    (B, T_q, D) x (B, T_k, D) x (B,) -> (B, T_q, D).  ``dropout_rate`` > 0
    applies attention dropout with torch semantics inside the kernel;
    ``dropout_seed`` is a (B,) int32 per-video seed (required when
    dropout_rate > 0).

    Sequence parallelism (parallel/sequence_parallel.py) hands each shard a
    LOCAL q slab and a halo-extended k/v slab: ``q_offset``/``k_offset``
    (B,) int32 place local row/col 0 at a global position — masking (length,
    band, self-exclusion) and the stateless dropout hash then run in global
    coordinates, so sharded outputs match the single-device kernel.
    ``diag_shift`` must equal ``q_offset - k_offset`` (static, uniform over
    the batch); the banded grid enumerates k blocks around local diagonal
    ``col = row + diag_shift``.
    """
    out, _ = _fwd(
        q, k, v, lengths, dropout_seed, q_offset, k_offset, scale, aperture,
        ignore_self, dropout_rate, block_q, block_k, diag_shift,
    )
    return out


def _fwd(q, k, v, lengths, dropout_seed, q_offset, k_offset, scale, aperture,
         ignore_self, dropout_rate, block_q, block_k, diag_shift):
    b, t_q, d = q.shape
    t_k = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((b,), jnp.int32)
    if q_offset is None:
        q_offset = jnp.zeros((b,), jnp.int32)
    if k_offset is None:
        k_offset = jnp.zeros((b,), jnp.int32)
    tq_pad = ((t_q + block_q - 1) // block_q) * block_q
    tk_pad = ((t_k + block_k - 1) // block_k) * block_k
    qp = _pad_to(q, tq_pad, 1)
    kp = _pad_to(k, tk_pad, 1)
    vp = _pad_to(v, tk_pad, 1)
    nq, nk = tq_pad // block_q, tk_pad // block_k
    nk_grid = nk if aperture is None else min(nk, _n_band_blocks(block_q, block_k, aperture))

    kernel = functools.partial(
        _fwd_kernel,
        scale=float(scale),
        block_q=block_q,
        block_k=block_k,
        aperture=aperture,
        ignore_self=ignore_self,
        nk_total=nk,
        dropout_rate=float(dropout_rate),
        diag_shift=int(diag_shift),
    )
    kmap = _k_index_map(block_q, block_k, aperture, nk, diag_shift)
    scalar_spec = pl.BlockSpec((1, 1, 1), lambda bi, qi, ki: (bi, 0, 0))
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, nq, nk_grid),
        in_specs=[
            # per-video true length / dropout seed / global row+col offsets,
            # shaped (B, 1, 1) so the (1, 1, 1) block satisfies TPU tiling.
            scalar_spec,
            scalar_spec,
            scalar_spec,
            scalar_spec,
            pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, d), kmap),
            pl.BlockSpec((1, block_k, d), kmap),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bi, qi, ki: (bi, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, tq_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        interpret=_use_interpret(),
    )(
        lengths.astype(jnp.int32).reshape(-1, 1, 1),
        dropout_seed.astype(jnp.int32).reshape(-1, 1, 1),
        q_offset.astype(jnp.int32).reshape(-1, 1, 1),
        k_offset.astype(jnp.int32).reshape(-1, 1, 1),
        qp, kp, vp,
    )
    return out[:, :t_q], (
        q, k, v, lengths, dropout_seed, q_offset, k_offset,
        out[:, :t_q], lse[:, :t_q, 0],
    )


def _fwd_rule(q, k, v, lengths, dropout_seed, scale, aperture, ignore_self,
              dropout_rate, block_q, block_k, q_offset, k_offset, diag_shift):
    return _fwd(q, k, v, lengths, dropout_seed, q_offset, k_offset, scale,
                aperture, ignore_self, dropout_rate, block_q, block_k,
                diag_shift)


def _bwd_rule(scale, aperture, ignore_self, dropout_rate, block_q, block_k,
              diag_shift, res, g):
    q, k, v, lengths, dropout_seed, q_offset, k_offset, out, lse = res
    b, t_q, d = q.shape
    t_k = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    delta = jnp.sum(g * out, axis=-1)  # (B, T_q)
    tq_pad = ((t_q + block_q - 1) // block_q) * block_q
    tk_pad = ((t_k + block_k - 1) // block_k) * block_k
    qp, gp = _pad_to(q, tq_pad, 1), _pad_to(g, tq_pad, 1)
    kp, vp = _pad_to(k, tk_pad, 1), _pad_to(v, tk_pad, 1)
    lsep = _pad_to(lse, tq_pad, 1)[..., None]  # (B, tq_pad, 1)
    deltap = _pad_to(delta, tq_pad, 1)[..., None]
    nq, nk = tq_pad // block_q, tk_pad // block_k
    lens = lengths.astype(jnp.int32).reshape(-1, 1, 1)
    seeds = dropout_seed.astype(jnp.int32).reshape(-1, 1, 1)
    qoffs = q_offset.astype(jnp.int32).reshape(-1, 1, 1)
    koffs = k_offset.astype(jnp.int32).reshape(-1, 1, 1)

    nq_grid = nq if aperture is None else min(nq, _n_band_blocks(block_k, block_q, aperture))
    qmap3, qmap2 = _q_index_map(block_q, block_k, aperture, nq, diag_shift)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kv_kernel,
            scale=float(scale), block_q=block_q, block_k=block_k,
            aperture=aperture, ignore_self=ignore_self, nq_total=nq,
            dropout_rate=float(dropout_rate), diag_shift=int(diag_shift),
        ),
        grid=(b, nk, nq_grid),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bi, ki, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda bi, ki, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda bi, ki, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda bi, ki, qi: (bi, 0, 0)),
            pl.BlockSpec((1, block_q, d), qmap3),
            pl.BlockSpec((1, block_k, d), lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((1, block_q, d), qmap3),
            pl.BlockSpec((1, block_q, 1), qmap2),
            pl.BlockSpec((1, block_q, 1), qmap2),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, ki, qi: (bi, ki, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, tk_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        interpret=_use_interpret(),
    )(lens, seeds, qoffs, koffs, qp, kp, vp, gp, lsep, deltap)

    nk_grid = nk if aperture is None else min(nk, _n_band_blocks(block_q, block_k, aperture))
    kmap = _k_index_map(block_q, block_k, aperture, nk, diag_shift)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_q_kernel,
            scale=float(scale), block_q=block_q, block_k=block_k,
            aperture=aperture, ignore_self=ignore_self, nk_total=nk,
            dropout_rate=float(dropout_rate), diag_shift=int(diag_shift),
        ),
        grid=(b, nq, nk_grid),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bi, qi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda bi, qi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda bi, qi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda bi, qi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, d), kmap),
            pl.BlockSpec((1, block_k, d), kmap),
            pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bi, qi, ki: (bi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        interpret=_use_interpret(),
    )(lens, seeds, qoffs, koffs, qp, kp, vp, gp, lsep, deltap)

    return dq[:, :t_q], dk[:, :t_k], dv[:, :t_k], None, None, None, None


flash_attention.defvjp(_fwd_rule, _bwd_rule)
