"""Full train-state checkpoint/resume (new capability).

The reference only snapshots best weights at fold end (summarizer/
main.py:32-35); a crash loses optimizer state and progress (SURVEY.md §5).
Here the complete training state — params, optimizer state, epoch counter,
PRNG key, per-video baselines — round-trips through msgpack, enabling
mid-run resume.
"""

from __future__ import annotations

import json
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
    # Set by load_state when the checkpoint carried no optimizer state (a
    # params-only fold-complete record): the opt_state is the template's
    # fresh one.  Callers that continue training from such a state should
    # warn — the moments restart (see Engine.maybe_save_state ``final``).
    light: bool = False


def state_nbytes(state: TrainState) -> int:
    """Host-side size estimate of the params + optimizer payload."""
    return sum(
        getattr(x, "nbytes", 0)
        for x in jax.tree.leaves((state.params, state.opt_state))
    )


def save_state(path: str, state: TrainState, light: bool = False) -> None:
    """``light=True`` drops the optimizer state from the payload (a GAN
    state is ~2.3 GB, two thirds of it Adam moments): the save completes
    ~3x faster, at the cost of a resume restarting the moments.  Retained
    for compatibility only — the engines save FULL state via
    ``save_state_sharded`` above a size threshold, which streams per
    component and keeps resume strict (VERDICT r2 item 8)."""
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


_MANIFEST_MAGIC = "summarizer_tpu.sharded_state"


def _write_atomic(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_state_sharded(path: str, state: TrainState) -> None:
    """Full-state save split into per-component part files (VERDICT r2
    item 8): params, then EACH optimizer chain (a GAN carries 3 masked
    Adams whose moments partition the tree), then a small head (epoch /
    rng / extras).  The manifest at ``path`` is written LAST, atomically,
    naming epoch-tagged part files — so a crash at ANY point leaves the
    previous complete checkpoint loadable (old manifest -> old parts),
    never a torn or mixed-epoch state.  Stale parts are pruned only after
    the new manifest lands.

    The device_get happens per part inside the loop, so host memory holds
    one component at a time and the (tunnel-slow) transfer of a 2.3 GB GAN
    state streams instead of materializing at once.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    part_dir = path + ".d"
    os.makedirs(part_dir, exist_ok=True)
    epoch = int(state.epoch)

    opt = state.opt_state
    # Exact-type check on purpose: an optax NamedTuple state (MaskedState,
    # InjectHyperparamsState, ...) is a tuple subclass but ONE optimizer,
    # not a chain container — splitting its fields into parts would make
    # the load unreconstructable.  Only plain tuple/list mark multi-chain.
    is_chain = type(opt) in (tuple, list)
    opt_parts = list(opt) if is_chain else [opt]
    components = [("params", state.params)] + [
        (f"opt{i}", s) for i, s in enumerate(opt_parts)
    ]
    head = {
        "epoch": np.int64(epoch),
        "rng": jax.device_get(state.rng)
        if state.rng is not None
        else np.zeros(2, np.uint32),
        "extras": jax.device_get(state.extras),
    }

    parts: dict[str, str] = {}
    for name, tree in components:
        fname = f"e{epoch}_{name}.msgpack"
        # Per-part device_get: stream the state component by component.
        _write_atomic(
            os.path.join(part_dir, fname),
            flax.serialization.to_bytes(jax.device_get(tree)),
        )
        parts[name] = fname
    head_name = f"e{epoch}_head.msgpack"
    _write_atomic(os.path.join(part_dir, head_name),
                  flax.serialization.to_bytes(head))
    parts["head"] = head_name

    manifest = {
        "magic": _MANIFEST_MAGIC,
        "epoch": epoch,
        "opt_is_tuple": is_chain,
        "n_opt": len(opt_parts),
        "parts": parts,
    }
    _write_atomic(path, json.dumps(manifest).encode())

    live = set(parts.values())
    for f in os.listdir(part_dir):
        if f not in live and not f.endswith(".tmp"):
            try:
                os.remove(os.path.join(part_dir, f))
            except OSError:
                pass


def _load_state_sharded(path: str, manifest: dict,
                        template: TrainState) -> TrainState:
    part_dir = path + ".d"
    restore = flax.serialization.from_state_dict

    def read(name):
        with open(os.path.join(part_dir, manifest["parts"][name]), "rb") as f:
            return flax.serialization.msgpack_restore(f.read())

    head = read("head")
    if manifest["opt_is_tuple"]:
        tpl = list(template.opt_state)
        if len(tpl) != manifest["n_opt"]:
            raise ValueError(
                f"checkpoint has {manifest['n_opt']} optimizer chains, "
                f"template has {len(tpl)}"
            )
        chains = [restore(tpl[i], read(f"opt{i}"))
                  for i in range(manifest["n_opt"])]
        # Explicit tuple/list reconstruction (NamedTuples never take this
        # branch: save_state_sharded only marks exact tuple/list as chains).
        opt_state = (list(chains) if type(template.opt_state) is list
                     else tuple(chains))
    else:
        opt_state = restore(template.opt_state, read("opt0"))
    rng_t = template.rng if template.rng is not None else np.zeros(2, np.uint32)
    return TrainState(
        params=restore(template.params, read("params")),
        opt_state=opt_state,
        epoch=int(head["epoch"]),
        rng=restore(rng_t, head["rng"]),
        extras=restore(template.extras, head.get("extras", {})),
    )


def load_state(path: str, template: TrainState) -> TrainState:
    """Structure-free restore (msgpack), then each component is mapped onto
    the template's pytree — a light checkpoint (no opt_state) loads against
    a full template and keeps the template's fresh optimizer state.  A
    sharded checkpoint (JSON manifest + part files) is auto-detected."""
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:1] == b"{":
        try:
            manifest = json.loads(blob)
        except ValueError:
            manifest = None
        if isinstance(manifest, dict) and manifest.get("magic") == _MANIFEST_MAGIC:
            return _load_state_sharded(path, manifest, template)
    raw = flax.serialization.msgpack_restore(blob)
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
        light="opt_state" not in raw,
    )
