"""Evaluation and summary-assembly ops.

Two tiers, golden-tested against each other:
  - ``eval_np``:  exact host-side oracles reproducing the reference semantics
    of summarizer/utils/eval.py:15-166 (including edge cases and epsilons).
  - ``eval_jax``: batched, jittable device versions (vmap over videos) so a
    full-dataset evaluation runs on-TPU in one compiled program.
"""

from summarizer_tpu.ops.eval_np import (  # noqa: F401
    upsample,
    generate_scores,
    evaluate_scores,
    generate_summary,
    evaluate_summary,
)
from summarizer_tpu.ops.knapsack import knapsack_solve  # noqa: F401
