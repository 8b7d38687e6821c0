"""Full train-state checkpoint/resume (new capability).

The reference only snapshots best weights at fold end (summarizer/
main.py:32-35); a crash loses optimizer state and progress (SURVEY.md §5).
Here the complete training state — params, optimizer state, epoch counter,
PRNG key, per-video baselines — round-trips through msgpack, enabling
mid-run resume.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import flax.serialization
import jax
import numpy as np


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: int = 0
    rng: Any = None
    extras: dict = field(default_factory=dict)  # e.g. DSN baselines


def save_state(path: str, state: TrainState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": np.int64(state.epoch),
        "rng": jax.device_get(state.rng) if state.rng is not None else np.zeros(2, np.uint32),
        "extras": jax.device_get(state.extras),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_state(path: str, template: TrainState) -> TrainState:
    target = {
        "params": template.params,
        "opt_state": template.opt_state,
        "epoch": np.int64(template.epoch),
        "rng": template.rng if template.rng is not None else np.zeros(2, np.uint32),
        "extras": template.extras,
    }
    with open(path, "rb") as f:
        restored = flax.serialization.from_bytes(target, f.read())
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        epoch=int(restored["epoch"]),
        rng=restored["rng"],
        extras=restored["extras"],
    )
