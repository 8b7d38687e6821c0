"""DSN: bidirectional recurrent scorer for REINFORCE training.

Ref: summarizer/models/dsn.py:17-47 — 1-layer bidirectional LSTM (or GRU),
hidden 256, then linear(2H -> 1) + sigmoid.  The diversity/representativeness
reward and episode sampling live in train/reinforce.py.
"""

from __future__ import annotations

import jax

from summarizer_tpu.nn.core import linear, linear_init
from summarizer_tpu.nn.rnn import gru_apply, gru_init, lstm_apply, lstm_init

DEFAULTS = dict(input_size=1024, hidden_size=256, num_layers=1, cell="lstm")


def init(rng, hp: dict):
    hp = {**DEFAULTS, **hp}
    k1, k2 = jax.random.split(rng)
    d, h, layers = int(hp["input_size"]), int(hp["hidden_size"]), int(hp["num_layers"])
    cell = str(hp.get("cell", "lstm"))
    assert cell in ("lstm", "gru"), "cell must be either 'lstm' or 'gru'"
    rnn_init = lstm_init if cell == "lstm" else gru_init
    return {
        "rnn": rnn_init(k1, d, h, num_layers=layers, bidirectional=True),
        "out": linear_init(k2, 2 * h, 1),
    }


def apply(params, x, mask, *, rng=None, train=False, hp: dict | None = None):
    hp = {**DEFAULTS, **(hp or {})}
    del rng, train
    lengths = mask.sum(-1).astype("int32") if mask is not None else None
    rnn_apply = lstm_apply if str(hp.get("cell", "lstm")) == "lstm" else gru_apply
    h, _ = rnn_apply(params["rnn"], x, lengths)
    return jax.nn.sigmoid(linear(params["out"], h))[..., 0]
