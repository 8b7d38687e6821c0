"""Int8 weight streaming for HBM-bound recurrent matmuls.

The 2048-wide SumGAN recurrences are weight-streaming-bound: every LSTM
timestep re-reads the full weight matrices from HBM (~134 MB/step for the
dLSTM decode in bf16), so videos/s is set by HBM bandwidth, not FLOPs
(BENCH_NOTES.md §3).  bf16 already halved the f32 traffic; int8 halves it
again AND doubles MXU throughput (int8 systolic passes).

Scheme (per recurrent matmul, inside the time scan):

  weights:     symmetric per-output-channel int8, quantized ONCE outside the
               scan from the f32 masters (XLA hoists the loop-invariant
               quantization; the scan body only ever touches the int8 copy,
               so nothing can be "un-hoisted" back to wide loads)
  activations: symmetric per-row dynamic int8, quantized on the VPU each
               step (a (B, H) tensor — negligible next to the weight read)
  product:     int8 x int8 -> int32 on the MXU, rescaled by the outer
               product of the two scale vectors in f32

The backward scans contract over the *other* weight axis, which requires
scales along the other dimension — so each matrix keeps two int8 copies
(fwd-quantized and bwd-quantized), still half the bytes of one bf16 copy
per direction of traversal.

This is a straight-through estimator: gradients are computed as if the
quantized matmuls were exact.  It is an opt-in performance mode
(``--int8 1``; implies the bf16 policy for the non-quantized math) — the
parity default stays full precision.  `tests/test_quant_rnn.py` bounds the
forward/grad error and `scripts/bench_gan.py --int8` measures the win.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

_rnn_int8 = contextvars.ContextVar("rnn_int8", default=False)

F32 = jnp.float32


@contextlib.contextmanager
def rnn_int8_streaming():
    """Enable int8 weight streaming for the lean-LSTM recurrent matmuls."""
    token = _rnn_int8.set(True)
    try:
        yield
    finally:
        _rnn_int8.reset(token)


def int8_enabled() -> bool:
    return bool(_rnn_int8.get())


def quant_sym(x, axis: int):
    """Symmetric int8 quantization along ``axis`` (the contraction axis):
    returns (q int8, scale f32 with ``axis`` kept as 1)."""
    s = jnp.max(jnp.abs(x), axis=axis, keepdims=True).astype(F32) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(F32) / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def qdot(x, wq, ws, pattern: str):
    """Quantized einsum ``pattern`` (x f32/bf16, wq int8 + scales ws).

    The activation is row-quantized on the fly; the int8 x int8 product
    accumulates in int32 on the MXU and is rescaled to f32.  ``pattern``
    must contract exactly the axis the two quantizations were taken along.
    """
    # activation scales: per everything except the contraction axis, which is
    # the one x shares with wq in the pattern.  All our patterns contract x's
    # LAST axis.
    xq, xs = quant_sym(x, axis=-1)
    acc = jnp.einsum(pattern, xq, wq, preferred_element_type=jnp.int32)
    # xs has x's shape with last axis 1; ws has w's shape with the contracted
    # axis 1.  Broadcasting them onto the output requires the caller-specific
    # alignment below.
    return acc.astype(F32) * xs * ws


def quant_weight_fwd(w):
    """Quantize a (.., K, O) weight for x(..,K) @ w -> (.., O): scales (.., 1, O)."""
    return quant_sym(w, axis=-2)


def quant_weight_bwd(w):
    """Quantize a (.., K, O) weight for g(.., O) @ w^T -> (.., K): scales (.., K, 1).

    The returned scale is already transposed onto the output layout: callers
    multiply by ``ws_t`` of shape (.., 1, K)."""
    q, s = quant_sym(w, axis=-1)  # scales (.., K, 1)
    return q, jnp.swapaxes(s, -1, -2)  # (.., 1, K)
