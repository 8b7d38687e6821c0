"""Training engines: jitted update steps + the k-fold experiment protocol."""

from summarizer_tpu.train.optim import torch_adam  # noqa: F401
from summarizer_tpu.train.loop import train as run_training  # noqa: F401
