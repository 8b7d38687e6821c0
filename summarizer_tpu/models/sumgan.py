"""SumGAN: adversarial LSTM video summarizer.

Components (ref: summarizer/models/sumgan.py:23-258):
  - sLSTM selector: 2-layer BiLSTM(1024) -> linear -> sigmoid scores
  - VAE: eLSTM encoder (2-layer uni LSTM(2048), mu/logvar heads on the final
    hidden states) + dLSTM step-wise decoder whose input is its previous
    output, reconstructing the *reversed* sequence
  - cLSTM discriminator: 2-layer uni LSTM(1024); prob from the last output,
    which also serves as the feature embedding for the reconstruction loss
The inference ABI (``apply``) is the selector alone (sumgan.py:251-258).

Decoding is a ``lax.scan`` carrying (x, h, c); the reversed-reconstruction
contract is honored under padding via a length-aware reverse.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from summarizer_tpu.nn.core import linear, linear_init
from summarizer_tpu.nn.rnn import lstm_apply, lstm_init, masked_reverse
from summarizer_tpu.nn.rnn_lean import dlstm_decode_lean

DEFAULTS = dict(
    input_size=1024,
    sLSTM_hidden_size=1024,
    sLSTM_num_layers=2,
    edLSTM_hidden_size=2048,
    edLSTM_num_layers=2,
    cLSTM_hidden_size=1024,
    cLSTM_num_layers=2,
)


# ------------------------------------------------------------------ modules
def slstm_init(rng, d, hidden, layers):
    k1, k2 = jax.random.split(rng)
    return {
        "lstm": lstm_init(k1, d, hidden, num_layers=layers, bidirectional=True),
        "out": linear_init(k2, 2 * hidden, 1),
    }


def slstm_apply(p, x, lengths):
    h, _ = lstm_apply(p["lstm"], x, lengths)
    return jax.nn.sigmoid(linear(p["out"], h))[..., 0]


def elstm_init(rng, d, hidden, layers):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "lstm": lstm_init(k1, d, hidden, num_layers=layers),
        "mu": linear_init(k2, hidden, hidden),
        "logvar": linear_init(k3, hidden, hidden),
    }


def elstm_apply(p, x, lengths):
    """Returns ((mu, logvar) of the final hidden states (L,B,H), c_last)."""
    _, (h_last, c_last) = lstm_apply(p["lstm"], x, lengths)
    return (linear(p["mu"], h_last), linear(p["logvar"], h_last)), c_last


def dlstm_init(rng, d, hidden, layers):
    k1, k2 = jax.random.split(rng)
    return {
        "lstm": lstm_init(k1, hidden, hidden, num_layers=layers),
        "recons": linear_init(k2, hidden, d),
    }


def dlstm_apply(p, t_max: int, h0, c0, lengths):
    """Decode t_max steps from (h0, c0); x_hat reconstructs the reversed
    input (sumgan.py:98-115), re-oriented per true length.

    The recurrence runs through the memory-lean custom-VJP decoder
    (nn/rnn_lean.dlstm_decode_lean); the reconstruction linear is applied to
    all steps at once as a single MXU matmul outside the scan."""
    tops = dlstm_decode_lean(p["lstm"], t_max, h0, c0)  # (B, T, H)
    outs = linear(p["recons"], tops)  # (B, T, D)
    return masked_reverse(outs, lengths)


def clstm_init(rng, d, hidden, layers):
    k1, k2 = jax.random.split(rng)
    return {
        "lstm": lstm_init(k1, d, hidden, num_layers=layers),
        "out": linear_init(k2, hidden, 1),
    }


def clstm_apply(p, x, lengths):
    """(probs (B,), h_last (B,H)) — prob from the last valid output
    (sumgan.py:185-210)."""
    outs, _ = lstm_apply(p["lstm"], x, lengths)
    last = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
    h_last = jnp.take_along_axis(outs, last[:, None, None], axis=1)[:, 0]
    probs = jax.nn.sigmoid(linear(p["out"], h_last))[..., 0]
    return probs, h_last


def _ck(fn, enabled: bool, static_argnums=()):
    """Per-stage rematerialization: checkpointing each sub-net caps the live
    residual set at ONE stage instead of the whole sLSTM->VAE->cLSTM chain —
    at video group 40 / T=640 the chain's lean residuals alone exceed the
    16 GB HBM.  The recurrences are weight-streaming-bound, so the recompute
    adds ~one forward of streaming per stage while unlocking the ~linear
    videos-per-weight-read scaling with group size."""
    return jax.checkpoint(fn, static_argnums=static_argnums) if enabled else fn


# -------------------------------------------------------------------- SumGAN
def init(rng, hp: dict):
    hp = {**DEFAULTS, **hp}
    d = int(hp["input_size"])
    k = jax.random.split(rng, 4)
    return {
        "s_lstm": slstm_init(k[0], d, int(hp["sLSTM_hidden_size"]), int(hp["sLSTM_num_layers"])),
        "e_lstm": elstm_init(k[1], d, int(hp["edLSTM_hidden_size"]), int(hp["edLSTM_num_layers"])),
        "d_lstm": dlstm_init(k[2], d, int(hp["edLSTM_hidden_size"]), int(hp["edLSTM_num_layers"])),
        "c_lstm": clstm_init(k[3], d, int(hp["cLSTM_hidden_size"]), int(hp["cLSTM_num_layers"])),
    }


def reparameterize(rng, mu, logvar):
    return mu + jax.random.normal(rng, mu.shape) * jnp.exp(0.5 * logvar)


def vae_forward(params, x, lengths, rng, remat: bool = False):
    """x -> (x_hat, (mu, logvar)) (ref: sumgan.py:117-148)."""
    (mu, logvar), c = _ck(elstm_apply, remat)(params["e_lstm"], x, lengths)
    h = reparameterize(rng, mu, logvar)
    x_hat = _ck(dlstm_apply, remat, static_argnums=(1,))(
        params["d_lstm"], x.shape[1], h, c, lengths
    )
    return x_hat, (mu, logvar)


def summarizer_forward(params, x, mask, rng, uniform: bool = False,
                       remat: bool = False):
    """x -> (x_hat, (mu, logvar), scores); ``uniform`` swaps the selector for
    U(0,1) scores, the paper's s_p branch (sumgan.py:150-183)."""
    lengths = mask.sum(-1).astype(jnp.int32)
    k1, k2 = jax.random.split(rng)
    if uniform:
        scores = jax.random.uniform(k1, x.shape[:2])
    else:
        scores = _ck(slstm_apply, remat)(params["s_lstm"], x, lengths)
    x_weighted = x * (scores * mask)[..., None]
    x_hat, dist = vae_forward(params, x_weighted, lengths, k2, remat=remat)
    return x_hat, dist, scores


def summarizer_forward_pair(params, x, mask, rng, remat: bool = False):
    """Selector-scored AND uniform-scored reconstructions in ONE batched VAE
    pass (the paper's x_hat and x_hat_p, sumgan.py:435-441).  Batching the
    two independent recurrences halves the sequential scan count — the
    latency bottleneck of small-batch RNNs on TPU."""
    lengths = mask.sum(-1).astype(jnp.int32)
    k1, k2 = jax.random.split(rng)
    scores = _ck(slstm_apply, remat)(params["s_lstm"], x, lengths)
    uniform = jax.random.uniform(k1, x.shape[:2])
    xw = jnp.concatenate(
        [x * (scores * mask)[..., None], x * (uniform * mask)[..., None]], axis=0
    )
    x_hats, _ = vae_forward(
        params, xw, jnp.concatenate([lengths, lengths]), k2, remat=remat
    )
    b = x.shape[0]
    return x_hats[:b], x_hats[b:], scores


def discriminate(params, x, mask):
    lengths = mask.sum(-1).astype(jnp.int32)
    return clstm_apply(params["c_lstm"], x, lengths)


def discriminate_many(params, xs, mask, remat: bool = False):
    """One batched cLSTM pass over k independent sequences sharing the mask:
    returns k (probs, h_last) pairs.  Replaces k sequential discriminator
    scans (sumgan.py:437-441) with one."""
    k = len(xs)
    b = xs[0].shape[0]
    lengths = mask.sum(-1).astype(jnp.int32)
    probs, h = _ck(clstm_apply, remat)(
        params["c_lstm"], jnp.concatenate(xs, axis=0), jnp.tile(lengths, k)
    )
    return [(probs[i * b : (i + 1) * b], h[i * b : (i + 1) * b]) for i in range(k)]


def apply(params, x, mask, *, rng=None, train=False, hp=None):
    del rng, train, hp
    lengths = (
        mask.sum(-1).astype(jnp.int32)
        if mask is not None
        else np.full((x.shape[0],), x.shape[1], np.int32)
    )
    return slstm_apply(params["s_lstm"], x, lengths)
