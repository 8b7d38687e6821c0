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


def save_state(path: str, state: TrainState, light: bool = False) -> None:
    """``light=True`` drops the optimizer state from the payload (a GAN
    state is ~2.3 GB, two thirds of it Adam moments): the save completes
    ~3x faster, at the cost of a resume restarting the moments.  Meant for
    crash-recovery under a flaky worker (``--resume_light 1``), where a
    save that outlives the worker's MTBF protects nothing."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "epoch": np.int64(state.epoch),
        "rng": jax.device_get(state.rng) if state.rng is not None else np.zeros(2, np.uint32),
        "extras": jax.device_get(state.extras),
    }
    if not light:
        payload["opt_state"] = jax.device_get(state.opt_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_state(path: str, template: TrainState) -> TrainState:
    """Structure-free restore (msgpack), then each component is mapped onto
    the template's pytree — a light checkpoint (no opt_state) loads against
    a full template and keeps the template's fresh optimizer state."""
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    restore = flax.serialization.from_state_dict
    opt_state = template.opt_state
    if "opt_state" in raw:
        opt_state = restore(template.opt_state, raw["opt_state"])
    rng_t = template.rng if template.rng is not None else np.zeros(2, np.uint32)
    return TrainState(
        params=restore(template.params, raw["params"]),
        opt_state=opt_state,
        epoch=int(raw["epoch"]),
        rng=restore(rng_t, raw["rng"]),
        extras=restore(template.extras, raw.get("extras", {})),
    )
