"""Model zoo registry.

String keys match the reference CLI registry (summarizer/utils/config.py:68-79)
so ``--model vasnet`` etc. behave identically.  Each spec carries the module
(init/apply) and which training engine drives it.
"""

from __future__ import annotations

from dataclasses import dataclass
from types import ModuleType

from summarizer_tpu.models import (  # noqa: F401
    dsn,
    logistic,
    random_scores,
    sumgan,
    sumgan_att,
    transformer,
    transformer_moe,
    vasnet,
    vslstm,
)


@dataclass(frozen=True)
class ModelSpec:
    name: str
    module: ModuleType
    engine: str  # supervised | reinforce | sumgan | sumgan_att
    trainable: bool = True


REGISTRY: dict[str, ModelSpec] = {
    "random": ModelSpec("random", random_scores, "supervised", trainable=False),
    "logistic": ModelSpec("logistic", logistic, "supervised"),
    "vasnet": ModelSpec("vasnet", vasnet, "supervised"),
    "transformer": ModelSpec("transformer", transformer, "supervised"),
    "transformer_moe": ModelSpec("transformer_moe", transformer_moe, "supervised"),
    "vslstm": ModelSpec("vslstm", vslstm, "supervised"),
    "dsn": ModelSpec("dsn", dsn, "reinforce"),
    "sumgan": ModelSpec("sumgan", sumgan, "sumgan"),
    "sumgan_att": ModelSpec("sumgan_att", sumgan_att, "sumgan_att"),
}


def get_model(name: str) -> ModelSpec:
    if name not in REGISTRY:
        raise KeyError(f"{name} model is not known; choose from {sorted(REGISTRY)}")
    return REGISTRY[name]
