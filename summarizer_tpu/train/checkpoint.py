"""Parameter checkpointing (msgpack pytrees).

Covers the reference's best-weights save/load contract (summarizer/models/
__init__.py:179-187, main.py:32-35): the best-by-correlation params per split
file, reloaded for full-dataset prediction.  Full train-state (optimizer +
step) resume — absent in the reference — is provided by train/resume.py.
"""

from __future__ import annotations

import os

import flax.serialization
import jax


def save_params(path: str, params) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(flax.serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, template):
    with open(path, "rb") as fh:
        return flax.serialization.from_bytes(template, fh.read())
