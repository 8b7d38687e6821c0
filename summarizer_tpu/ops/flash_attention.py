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


def _overlap(qb, kb, block_q, block_k, aperture):
    """Does k block kb intersect q block qb's |i-j| <= aperture band?"""
    q_lo = qb * block_q
    k_lo = kb * block_k
    return (k_lo <= q_lo + block_q - 1 + aperture) & (
        k_lo + block_k - 1 >= q_lo - aperture
    )


def _first_kb(qb, block_q, block_k, aperture):
    return jnp.maximum(qb * block_q - aperture, 0) // block_k


def _first_qb(kb, block_q, block_k, aperture):
    return jnp.maximum(kb * block_k - aperture, 0) // block_q


def _n_band_blocks(block_a, block_b, aperture):
    """Static bound on how many b-blocks one a-block's band can touch."""
    return (block_a + 2 * aperture) // block_b + 2


def _mask_for(rows, cols, length, aperture, ignore_self):
    mask = cols < length
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
    len_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, block_q, block_k, aperture, ignore_self, nk_total, dropout_rate,
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
        kb = _first_kb(qi, block_q, block_k, aperture) + ki
        live = (kb < nk_total) & _overlap(qi, kb, block_q, block_k, aperture)

    @pl.when(live)
    def _compute():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK)
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
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
    len_ref, seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale, block_q, block_k, aperture, ignore_self, nq_total, dropout_rate,
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
        qb = _first_qb(ki, block_q, block_k, aperture) + qi
        live = (qb < nq_total) & _overlap(qb, ki, block_q, block_k, aperture)

    @pl.when(live)
    def _compute():
        q = q_ref[0]
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK)
        rows = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
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
    len_ref, seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, scale, block_q, block_k, aperture, ignore_self, nk_total, dropout_rate,
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
        kb = _first_kb(qi, block_q, block_k, aperture) + ki
        live = (kb < nk_total) & _overlap(qi, kb, block_q, block_k, aperture)

    @pl.when(live)
    def _compute():
        k = k_ref[0]
        s = jax.lax.dot_general(
            q_ref[0], k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
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


def _k_index_map(block_q, block_k, aperture, nk_total):
    """k/v block index map for a banded (qi-relative) k grid axis."""
    if aperture is None:
        return lambda bi, qi, ki: (bi, ki, 0)

    def imap(bi, qi, ki):
        kb = _first_kb(qi, block_q, block_k, aperture) + ki
        return (bi, jnp.minimum(kb, nk_total - 1), 0)

    return imap


def _q_index_map(block_q, block_k, aperture, nq_total):
    """q-side index maps for the dkv kernel's banded q grid axis."""
    if aperture is None:
        return (
            lambda bi, ki, qi: (bi, qi, 0),
            lambda bi, ki, qi: (bi, qi, 0),
        )

    def imap3(bi, ki, qi):
        qb = _first_qb(ki, block_q, block_k, aperture) + qi
        return (bi, jnp.minimum(qb, nq_total - 1), 0)

    def imap2(bi, ki, qi):
        qb = _first_qb(ki, block_q, block_k, aperture) + qi
        return (bi, jnp.minimum(qb, nq_total - 1), 0)

    return imap3, imap2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
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
):
    """softmax(mask(q @ k^T * scale)) [-> dropout] @ v, blockwise.

    (B, T, D) x (B,) -> (B, T, D).  ``dropout_rate`` > 0 applies attention
    dropout with torch semantics inside the kernel; ``dropout_seed`` is a
    (B,) int32 per-video seed (required when dropout_rate > 0).
    """
    out, _ = _fwd(
        q, k, v, lengths, dropout_seed, scale, aperture, ignore_self,
        dropout_rate, block_q, block_k,
    )
    return out


def _fwd(q, k, v, lengths, dropout_seed, scale, aperture, ignore_self,
         dropout_rate, block_q, block_k):
    b, t, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((b,), jnp.int32)
    blk = max(block_q, block_k)
    t_pad = ((t + blk - 1) // blk) * blk
    qp, kp, vp = (_pad_to(x, t_pad, 1) for x in (q, k, v))
    nq, nk = t_pad // block_q, t_pad // block_k
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
    )
    kmap = _k_index_map(block_q, block_k, aperture, nk)
    scalar_spec = pl.BlockSpec((1, 1, 1), lambda bi, qi, ki: (bi, 0, 0))
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, nq, nk_grid),
        in_specs=[
            # per-video true length / dropout seed, shaped (B, 1, 1) so the
            # (1, 1, 1) block satisfies TPU tiling.
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
            jax.ShapeDtypeStruct((b, t_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        interpret=_use_interpret(),
    )(
        lengths.astype(jnp.int32).reshape(-1, 1, 1),
        dropout_seed.astype(jnp.int32).reshape(-1, 1, 1),
        qp, kp, vp,
    )
    return out[:, :t], (q, k, v, lengths, dropout_seed, out[:, :t], lse[:, :t, 0])


def _fwd_rule(q, k, v, lengths, dropout_seed, scale, aperture, ignore_self,
              dropout_rate, block_q, block_k):
    return _fwd(q, k, v, lengths, dropout_seed, scale, aperture, ignore_self,
                dropout_rate, block_q, block_k)


def _bwd_rule(scale, aperture, ignore_self, dropout_rate, block_q, block_k, res, g):
    q, k, v, lengths, dropout_seed, out, lse = res
    b, t, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    delta = jnp.sum(g * out, axis=-1)  # (B, T)
    blk = max(block_q, block_k)
    t_pad = ((t + blk - 1) // blk) * blk
    qp, kp, vp, gp = (_pad_to(x, t_pad, 1) for x in (q, k, v, g))
    lsep = _pad_to(lse, t_pad, 1)[..., None]  # (B, t_pad, 1)
    deltap = _pad_to(delta, t_pad, 1)[..., None]
    nq, nk = t_pad // block_q, t_pad // block_k
    lens = lengths.astype(jnp.int32).reshape(-1, 1, 1)
    seeds = dropout_seed.astype(jnp.int32).reshape(-1, 1, 1)

    nq_grid = nq if aperture is None else min(nq, _n_band_blocks(block_k, block_q, aperture))
    qmap3, qmap2 = _q_index_map(block_q, block_k, aperture, nq)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kv_kernel,
            scale=float(scale), block_q=block_q, block_k=block_k,
            aperture=aperture, ignore_self=ignore_self, nq_total=nq,
            dropout_rate=float(dropout_rate),
        ),
        grid=(b, nk, nq_grid),
        in_specs=[
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
            jax.ShapeDtypeStruct((b, t_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        interpret=_use_interpret(),
    )(lens, seeds, qp, kp, vp, gp, lsep, deltap)

    nk_grid = nk if aperture is None else min(nk, _n_band_blocks(block_q, block_k, aperture))
    kmap = _k_index_map(block_q, block_k, aperture, nk)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_q_kernel,
            scale=float(scale), block_q=block_q, block_k=block_k,
            aperture=aperture, ignore_self=ignore_self, nk_total=nk,
            dropout_rate=float(dropout_rate),
        ),
        grid=(b, nq, nk_grid),
        in_specs=[
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
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        interpret=_use_interpret(),
    )(lens, seeds, qp, kp, vp, gp, lsep, deltap)

    return dq[:, :t], dk[:, :t], dv[:, :t], None, None


flash_attention.defvjp(_fwd_rule, _bwd_rule)
