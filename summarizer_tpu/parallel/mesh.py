"""Mesh construction over available devices."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, dp: int | None = None, tp: int = 1) -> Mesh:
    """A (dp, tp) mesh over the first ``n_devices`` devices.

    ``dp`` defaults to ``n_devices // tp``.  Axis names: "dp" (videos) and
    "tp" (hidden dims).  A single-chip mesh (1, 1) is valid and keeps the
    sharded code path identical on one device.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if dp is None:
        assert n_devices % tp == 0, (n_devices, tp)
        dp = n_devices // tp
    assert dp * tp <= len(devices), f"need {dp * tp} devices, have {len(devices)}"
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))
