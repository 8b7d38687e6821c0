"""vsLSTM: supervised bidirectional-LSTM frame scorer.

The classic video-summarization LSTM (Zhang et al., "Video Summarization
with Long Short-term Memory") trained with supervised MSE — the BiLSTM
counterpart the reference exposes only inside DSN's REINFORCE loop
(summarizer/models/dsn.py:17-47); here it is a first-class supervised
family (BASELINE.json config 2).  Defaults follow DSN's tower: 1-layer
bidirectional LSTM, hidden 256, linear + sigmoid head.
"""

from __future__ import annotations

import jax

from summarizer_tpu.nn.core import linear, linear_init
from summarizer_tpu.nn.rnn import lstm_apply, lstm_init

DEFAULTS = dict(input_size=1024, hidden_size=256, num_layers=1)


def init(rng, hp: dict):
    hp = {**DEFAULTS, **hp}
    k1, k2 = jax.random.split(rng)
    d, h = int(hp["input_size"]), int(hp["hidden_size"])
    return {
        "rnn": lstm_init(k1, d, h, num_layers=int(hp["num_layers"]), bidirectional=True),
        "out": linear_init(k2, 2 * h, 1),
    }


def apply(params, x, mask, *, rng=None, train=False, hp=None):
    del rng, train, hp
    lengths = mask.sum(-1).astype("int32") if mask is not None else None
    h, _ = lstm_apply(params["rnn"], x, lengths)
    return jax.nn.sigmoid(linear(params["out"], h))[..., 0]
