"""Compute-dtype policy for the HBM-bound recurrent matmuls.

Batch-1 LSTM steps are weight-streaming-bound (BENCH_NOTES.md §3): casting
the weights to bfloat16 for the cell matmuls halves the per-timestep HBM
traffic.  XLA hoists the loop-invariant casts out of the time scan, so the
conversion itself is amortized over the sequence.  Accumulation stays f32
(``preferred_element_type``), as do params, optimizer state, and all
non-recurrent math.

The policy is a context variable consulted at *trace* time; engines enable
it for the lifetime of a fold (``--bf16 1``), so every retrace of the same
program sees the same policy.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

_rnn_compute_dtype = contextvars.ContextVar("rnn_compute_dtype", default=None)


@contextlib.contextmanager
def rnn_compute(dtype):
    """Enable a compute dtype (e.g. jnp.bfloat16) for RNN cell matmuls."""
    token = _rnn_compute_dtype.set(dtype)
    try:
        yield
    finally:
        _rnn_compute_dtype.reset(token)


def cast_rnn_operands(x, w):
    dt = _rnn_compute_dtype.get()
    if dt is None:
        return x, w
    return x.astype(dt), w.astype(dt)


def precast_rnn_weights(p: dict) -> dict:
    """Cast a cell's w_ih/w_hh ONCE, for hoisting *outside* a scan: a cast
    left inside the loop body re-reads the f32 master weights every timestep
    and makes things worse, not better.  Biases stay f32 (added post-matmul).
    """
    dt = _rnn_compute_dtype.get()
    if dt is None:
        return p
    out = dict(p)
    for k in ("w_ih", "w_hh"):
        if k in out:
            out[k] = out[k].astype(dt)
    return out
