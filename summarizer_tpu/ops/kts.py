"""KTS (kernel temporal segmentation) as a jittable DP — on-device
change-point detection.

The reference *consumes* precomputed KTS segments (/change_points in the
h5 schema) and never implements KTS; its paper reports the reference CPU
implementation needed ~6 h and 120 GB RAM for a single Twitch-LOL video, so
LOL fell back to uniform 2-second segments (Summarizer.pdf §2.2).  This
module closes the raw-video pipeline gap (frames -> features -> segments)
with the classic formulation vectorized for the MXU/VPU:

  - Gram matrix K = X X^T (one MXU matmul; features are L2-normalized for
    the standard cosine kernel).
  - Within-segment scatter via integral images:
      C(i, j) = sum_t<j,t>=i K_tt  -  (S(i, j) / (j - i))
    where S is the 2-D prefix sum of K — every C(i, j) in O(1).
  - DP over segment count m: L_m(j) = min_i L_{m-1}(i) + C(i, j), one
    ``lax.scan`` step per segment, vectorized over (i, j) on the VPU.
  - Model selection: m* = argmin_m L_m(T) + penalty * m * (log(T/m) + 1),
    the standard KTS penalized criterion.

Cost: O(m_max * T^2) FLOPs and O(T^2) memory — seconds on a TPU for T in
the thousands.  A numpy oracle ships for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _segment_costs(k_gram: jnp.ndarray) -> jnp.ndarray:
    """C[i, j] = within-segment scatter of [i, j) for all i < j.

    k_gram: (T, T).  Returns (T+1, T+1) with junk at i >= j (masked in DP).
    """
    t = k_gram.shape[0]
    diag = jnp.diagonal(k_gram)
    cum_diag = jnp.concatenate([jnp.zeros(1, k_gram.dtype), jnp.cumsum(diag)])
    # 2-D integral image: S[a, b] = sum of K[:a, :b]
    s = jnp.cumsum(jnp.cumsum(k_gram, axis=0), axis=1)
    s = jnp.pad(s, ((1, 0), (1, 0)))
    i = jnp.arange(t + 1)[:, None]
    j = jnp.arange(t + 1)[None, :]
    block = s[j, j] - s[i, j] - s[j, i] + s[i, i]  # sum of K[i:j, i:j]
    length = jnp.maximum(j - i, 1).astype(k_gram.dtype)
    tr = cum_diag[j] - cum_diag[i]
    return tr - block / length


@partial(jax.jit, static_argnames=("max_segments",))
def kts_costs(features: jnp.ndarray, max_segments: int):
    """(L, back): L[m, j] = best scatter of x[:j] split into m+1 segments,
    back[m, j] = the argmin split point. features: (T, D)."""
    x = features.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.maximum((x * x).sum(-1, keepdims=True), 1e-12))
    k_gram = x @ x.T
    c = _segment_costs(k_gram)  # (T+1, T+1)
    t = x.shape[0]
    big = jnp.float32(1e30)

    l0 = c[0]  # one segment: [0, j)

    def step(prev, _):
        # cand[i, j] = prev[i] + C(i, j), only i < j valid
        cand = prev[:, None] + c
        ii = jnp.arange(t + 1)
        invalid = ii[:, None] >= ii[None, :]
        cand = jnp.where(invalid, big, cand)
        best = jnp.min(cand, axis=0)
        arg = jnp.argmin(cand, axis=0)
        return best, (best, arg)

    _, (ls, backs) = jax.lax.scan(step, l0, None, length=max_segments - 1)
    l_all = jnp.concatenate([l0[None], ls])  # (max_segments, T+1)
    backs = jnp.concatenate([jnp.zeros((1, t + 1), jnp.int32), backs.astype(jnp.int32)])
    return l_all, backs


@partial(jax.jit, static_argnames=("max_segments", "force_m"))
def _kts_bounds(features, max_segments: int, penalty, force_m: bool):
    """DP + on-device model selection + on-device backtrack.  Only the
    (max_segments+1,) bounds vector and m* leave the device — bulk
    device->host transfers are expensive on tunneled TPUs."""
    l_all, backs = kts_costs(features, max_segments)
    t = features.shape[0]
    if force_m:
        m_star = jnp.int32(max_segments - 1)
    else:
        m = jnp.arange(1, max_segments + 1, dtype=jnp.float32)
        crit = l_all[:, t] + penalty * m * (jnp.log(t / m) + 1.0)
        m_star = jnp.argmin(crit).astype(jnp.int32)

    def back_step(carry, i):
        j, m = carry
        take = m > 0
        j_new = jnp.where(take, backs[jnp.maximum(m, 0), j], 0)
        return (j_new, m - 1), j_new

    (_, _), bounds_rev = jax.lax.scan(
        back_step, (jnp.int32(t), m_star), jnp.arange(max_segments)
    )
    return m_star, bounds_rev  # split points (descending), zero-padded


def kts_segment(
    features: np.ndarray,
    max_segments: int,
    penalty: float | None = None,
) -> np.ndarray:
    """Change points for one video: (n_segs, 2) inclusive [start, end] rows
    in feature-step indices (multiply by the frame subsample rate for frame
    indices).  ``penalty=None`` uses the standard vmax criterion with
    vmax = 1.0; pass 0 to force exactly ``max_segments`` segments."""
    t = features.shape[0]
    max_segments = max(1, min(int(max_segments), t))
    m_star, bounds_rev = jax.device_get(
        _kts_bounds(
            jnp.asarray(features),
            max_segments,
            np.float32(1.0 if not penalty else penalty),
            penalty == 0,
        )
    )
    m_star = int(m_star)
    bounds = sorted(set([0, t] + [int(b) for b in bounds_rev[:m_star]]))
    return np.array(
        [[bounds[s], bounds[s + 1] - 1] for s in range(len(bounds) - 1)],
        dtype=np.int32,
    )


def kts_oracle(features: np.ndarray, n_segments: int) -> np.ndarray:
    """Exact numpy DP (same math, no device) — the test oracle."""
    x = features.astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    k = x @ x.T
    t = len(x)
    s = np.zeros((t + 1, t + 1))
    s[1:, 1:] = np.cumsum(np.cumsum(k, 0), 1)
    cd = np.concatenate([[0], np.cumsum(np.diagonal(k))])

    def cost(i, j):
        block = s[j, j] - s[i, j] - s[j, i] + s[i, i]
        return (cd[j] - cd[i]) - block / max(j - i, 1)

    big = 1e30
    L = np.full((n_segments, t + 1), big)
    back = np.zeros((n_segments, t + 1), np.int64)
    for j in range(t + 1):
        L[0, j] = cost(0, j)
    for m in range(1, n_segments):
        for j in range(t + 1):
            best, arg = big, 0
            for i in range(j):
                v = L[m - 1, i] + cost(i, j)
                if v < best:
                    best, arg = v, i
            L[m, j] = best
            back[m, j] = arg
    bounds = [t]
    j = t
    for m in range(n_segments - 1, 0, -1):
        j = int(back[m, j])
        bounds.append(j)
    bounds.append(0)
    bounds = sorted(set(bounds))
    return np.array(
        [[bounds[s], bounds[s + 1] - 1] for s in range(len(bounds) - 1)], np.int32
    )
