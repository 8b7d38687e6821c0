"""Config, logging, and experiment utilities."""

from summarizer_tpu.utils.config import HParameters, Proportion  # noqa: F401
