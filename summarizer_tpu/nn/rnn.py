"""LSTM/GRU via ``lax.scan`` with torch cell semantics and length masking.

TPU-first structure: the input projection for *all* timesteps is hoisted out
of the scan as one large MXU matmul; only the O(H^2) recurrent term stays
sequential.  Bidirectionality uses a length-aware reverse (padded tails stay
in place) so final states and backward passes see the true sequence, which a
naive flip of a padded array would not.

Replaces nn.LSTM/nn.GRU usage in the reference zoo (summarizer/models/
dsn.py:23-33, sumgan.py:23-115, :185-210).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from summarizer_tpu.nn.core import _uniform
from summarizer_tpu.nn.policy import cast_rnn_operands, precast_rnn_weights


def masked_reverse(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sequence within its true length. x: (B, T, ...), lengths: (B,)."""
    t = x.shape[1]
    ts = np.arange(t)

    def one(xb, lb):
        idx = jnp.where(ts < lb, lb - 1 - ts, ts)
        return xb[idx]

    return jax.vmap(one)(x, lengths)


def _cell_params(rng, in_dim, hidden, n_gates):
    k = jax.random.split(rng, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "w_ih": _uniform(k[0], (in_dim, n_gates * hidden), bound),
        "w_hh": _uniform(k[1], (hidden, n_gates * hidden), bound),
        "b_ih": _uniform(k[2], (n_gates * hidden,), bound),
        "b_hh": _uniform(k[3], (n_gates * hidden,), bound),
    }


def _stack_init(rng, input_size, hidden, num_layers, bidirectional, n_gates):
    layers = []
    dirs = 2 if bidirectional else 1
    for layer_idx in range(num_layers):
        in_dim = input_size if layer_idx == 0 else hidden * dirs
        rng, kf, kb = jax.random.split(rng, 3)
        entry = {"fwd": _cell_params(kf, in_dim, hidden, n_gates)}
        if bidirectional:
            entry["bwd"] = _cell_params(kb, in_dim, hidden, n_gates)
        layers.append(entry)
    return {"layers": layers}


def lstm_init(rng, input_size, hidden_size, num_layers=1, bidirectional=False):
    return _stack_init(rng, input_size, hidden_size, num_layers, bidirectional, 4)


def gru_init(rng, input_size, hidden_size, num_layers=1, bidirectional=False):
    return _stack_init(rng, input_size, hidden_size, num_layers, bidirectional, 3)


def _lstm_layer(p, x, lengths):
    """One direction, one layer. x: (B, T, D) -> outputs (B, T, H) plus the
    (h, c) at each sequence's last valid step."""
    b, t, _ = x.shape
    h4 = p["w_hh"].shape[1]
    hidden = h4 // 4
    p = precast_rnn_weights(p)  # hoisted: one cast, not one per timestep
    xc, w_ih = cast_rnn_operands(x, p["w_ih"])
    xg = jnp.dot(xc, w_ih, preferred_element_type=jnp.float32) + p["b_ih"] + p["b_hh"]

    def step(carry, xt):  # xt: (B, 4H)
        h, c = carry
        hc, w_hh = cast_rnn_operands(h, p["w_hh"])
        z = xt + jnp.dot(hc, w_hh, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(z, 4, axis=-1)  # torch gate order i,f,g,o
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c2 = f * c + i * jnp.tanh(g)
        h2 = o * jnp.tanh(c2)
        return (h2, c2), (h2, c2)

    zeros = jnp.asarray(np.zeros((b, hidden), np.float32))
    _, (hs, cs) = jax.lax.scan(step, (zeros, zeros), jnp.swapaxes(xg, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    cs = jnp.swapaxes(cs, 0, 1)
    last = jnp.clip(lengths - 1, 0, t - 1)
    h_last = jnp.take_along_axis(hs, last[:, None, None], axis=1)[:, 0]
    c_last = jnp.take_along_axis(cs, last[:, None, None], axis=1)[:, 0]
    return hs, (h_last, c_last)


def _gru_layer(p, x, lengths):
    b, t, _ = x.shape
    hidden = p["w_hh"].shape[0]
    p = precast_rnn_weights(p)
    xc, w_ih = cast_rnn_operands(x, p["w_ih"])
    xg = jnp.dot(xc, w_ih, preferred_element_type=jnp.float32) + p["b_ih"]

    def step(h, xt):
        hc, w_hh = cast_rnn_operands(h, p["w_hh"])
        hg = jnp.dot(hc, w_hh, preferred_element_type=jnp.float32) + p["b_hh"]
        xr, xz, xn = jnp.split(xt, 3, axis=-1)  # torch gate order r,z,n
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h2 = (1.0 - z) * n + z * h
        return h2, h2

    zeros = jnp.asarray(np.zeros((b, hidden), np.float32))
    _, hs = jax.lax.scan(step, zeros, jnp.swapaxes(xg, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)
    last = jnp.clip(lengths - 1, 0, t - 1)
    h_last = jnp.take_along_axis(hs, last[:, None, None], axis=1)[:, 0]
    return hs, (h_last, None)


def _lstm_layer_bidir(pf, pb, x, lengths):
    """Fused bidirectional LSTM layer: both directions ride ONE ``lax.scan``
    (the backward direction as a length-reversed second batch half with its
    own weights via a batched matmul), halving the sequential scan count —
    the latency bottleneck of small-batch recurrence on TPU."""
    b, t, _ = x.shape
    hidden = pf["w_hh"].shape[0]
    pf = precast_rnn_weights(pf)
    pb = precast_rnn_weights(pb)
    xs = jnp.stack([x, masked_reverse(x, lengths)])  # (2, B, T, D)
    w_ih = jnp.stack([pf["w_ih"], pb["w_ih"]])  # (2, D, 4H)
    w_hh = jnp.stack([pf["w_hh"], pb["w_hh"]])  # (2, H, 4H)
    bias = jnp.stack([pf["b_ih"] + pf["b_hh"], pb["b_ih"] + pb["b_hh"]])  # (2, 4H)

    xc, w_ihc = cast_rnn_operands(xs, w_ih)
    xg = (
        jnp.einsum("dbti,dio->dbto", xc, w_ihc, preferred_element_type=jnp.float32)
        + bias[:, None, None, :]
    )

    def step(carry, xt):  # xt: (2, B, 4H)
        h, c = carry
        hc, w_hhc = cast_rnn_operands(h, w_hh)
        z = xt + jnp.einsum("dbh,dho->dbo", hc, w_hhc, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c2 = f * c + i * jnp.tanh(g)
        h2 = o * jnp.tanh(c2)
        return (h2, c2), (h2, c2)

    zeros = jnp.asarray(np.zeros((2, b, hidden), np.float32))
    _, (hs, cs) = jax.lax.scan(step, (zeros, zeros), jnp.moveaxis(xg, 2, 0))
    hs = jnp.moveaxis(hs, 0, 2)  # (2, B, T, H)
    cs = jnp.moveaxis(cs, 0, 2)
    last = jnp.clip(lengths - 1, 0, t - 1)

    def gather_last(a):
        return jnp.take_along_axis(a, last[None, :, None, None], axis=2)[:, :, 0]

    h_last = gather_last(hs)  # (2, B, H)
    c_last = gather_last(cs)
    out = jnp.concatenate([hs[0], masked_reverse(hs[1], lengths)], axis=-1)
    return out, (h_last[0], c_last[0]), (h_last[1], c_last[1])


#: Route LSTM layers through the memory-lean custom-VJP implementation
#: (nn/rnn_lean.py).  Forward math is identical; backward saves ~6x less
#: residual memory, which is what bounds large video groups.  Tests flip
#: this to compare both paths.
USE_LEAN_LSTM = True


def _stack_apply(params, x, lengths, layer_fn, carry_state):
    """Run the stacked (bi)directional recurrence.

    Returns (outputs (B,T,H*dirs), (h_last, c_last)) where the final states
    are stacked (num_layers*dirs, B, H) in torch order [l0_f, l0_b, l1_f, ...].
    """
    if lengths is None:
        lengths = np.full((x.shape[0],), x.shape[1], np.int32)
    is_lstm = layer_fn is _lstm_layer
    if is_lstm and USE_LEAN_LSTM:
        from summarizer_tpu.nn import rnn_lean

        uni_fn = rnn_lean.lstm_layer_lean
    else:
        uni_fn = layer_fn
    h_lasts, c_lasts = [], []
    out = x
    for entry in params["layers"]:
        if "bwd" in entry and is_lstm:
            if USE_LEAN_LSTM:
                from summarizer_tpu.nn import rnn_lean

                out, (hf, cf), (hb, cb) = rnn_lean.lstm_layer_lean_bidir(
                    entry["fwd"], entry["bwd"], out, lengths, masked_reverse
                )
            else:
                out, (hf, cf), (hb, cb) = _lstm_layer_bidir(
                    entry["fwd"], entry["bwd"], out, lengths
                )
            h_lasts += [hf, hb]
            c_lasts += [cf, cb]
            continue
        fwd, (hf, cf) = uni_fn(entry["fwd"], out, lengths)
        h_lasts.append(hf)
        c_lasts.append(cf)
        if "bwd" in entry:
            rev = masked_reverse(out, lengths)
            bwd_r, (hb, cb) = layer_fn(entry["bwd"], rev, lengths)
            bwd = masked_reverse(bwd_r, lengths)
            h_lasts.append(hb)
            c_lasts.append(cb)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
    h_last = jnp.stack(h_lasts)
    c_last = jnp.stack(c_lasts) if carry_state and c_lasts[0] is not None else None
    return out, (h_last, c_last)


def lstm_apply(params, x, lengths=None):
    return _stack_apply(params, x, lengths, _lstm_layer, carry_state=True)


def precast_stack(params):
    """Pre-cast all layers' weights under the active policy (call OUTSIDE
    any scan so the casts hoist)."""
    return {
        "layers": [
            {d: precast_rnn_weights(cell) for d, cell in entry.items()}
            for entry in params["layers"]
        ]
    }


def lstm_cell_step(params, x, h, c):
    """One timestep through a stacked unidirectional LSTM.

    x: (B, D); h, c: (L, B, H).  Returns (top-layer output, (h', c')).
    Used by step-wise decoders (SumGAN dLSTM, summarizer/models/
    sumgan.py:88-115) where each step's input is the previous output.
    """
    hs, cs = [], []
    inp = x
    for li, entry in enumerate(params["layers"]):
        p = entry["fwd"]
        ic, w_ih = cast_rnn_operands(inp, p["w_ih"])
        hc, w_hh = cast_rnn_operands(h[li], p["w_hh"])
        z = (
            jnp.dot(ic, w_ih, preferred_element_type=jnp.float32)
            + p["b_ih"]
            + jnp.dot(hc, w_hh, preferred_element_type=jnp.float32)
            + p["b_hh"]
        )
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c2 = f * c[li] + i * jnp.tanh(g)
        h2 = o * jnp.tanh(c2)
        hs.append(h2)
        cs.append(c2)
        inp = h2
    return inp, (jnp.stack(hs), jnp.stack(cs))


def gru_apply(params, x, lengths=None):
    return _stack_apply(params, x, lengths, _gru_layer, carry_state=False)
