"""summarizer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-summarization framework.

A ground-up rebuild of the capabilities of sylvainma/Summarizer (the reference
lives at /root/reference and is cited throughout as ``file:line``): a model zoo
of frame-importance scorers trained on precomputed CNN features, evaluated by
rank correlation and keyshot F1 after segment + 0/1-knapsack summary assembly,
with k-fold cross-validation, benchmark tables, and an MP4 summary exporter.

Architecture (TPU-first, not a port):
  - ``data/``     host-side HDF5 readers + padded/masked batch packing (XLA
                  needs static shapes; the reference used dynamic per-video
                  shapes, summarizer/models/logistic.py:68-70).
  - ``ops/``      pure jittable eval ops (upsample, tie-aware Spearman/Kendall,
                  segment pooling, 0/1-knapsack DP via ``lax.scan``) plus exact
                  numpy oracles matching summarizer/utils/eval.py semantics.
  - ``nn/``       a minimal pytree module system: init fns -> param pytrees,
                  pure apply fns, ``lax.scan`` LSTMs/GRUs, masked attention.
  - ``models/``   the zoo: random, logistic, VASNet, Transformer, DSN, SumGAN,
                  SumGAN-att.  Shared ABI: ``apply(params, x[B,T,D], mask[B,T])
                  -> scores[B,T]``.
  - ``train/``    jitted training engines (supervised MSE, REINFORCE,
                  adversarial), torch-semantics Adam via optax, k-fold CV
                  driver, checkpointing.
  - ``parallel/`` device-mesh data parallelism (shard_map over a 1-D mesh,
                  psum'd grads) — a new capability; the reference was strictly
                  single-device (summarizer/utils/config.py:94-103).
  - ``native/``   first-party C++ (knapsack DP, rank stats) loaded via ctypes,
                  replacing the reference's OR-Tools dependency
                  (summarizer/utils/knapsack.py:5-23).
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # The deployment image's sitecustomize force-registers the TPU PJRT
    # plugin at interpreter startup, which overrides the JAX_PLATFORMS env
    # var (observed: ``JAX_PLATFORMS=cpu`` still yields the 'tpu' backend).
    # Honor the env var by pinning through jax.config before the first
    # backend initialization, so CLIs can be steered onto the host CPU while
    # another process owns the chip (tests/conftest.py does the same; the
    # reproduce --dry-run rehearsal depends on it).
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception as _e:  # pragma: no cover - backend already up
        # A silent failure here reproduces the exact hazard this pin exists
        # to prevent (a CPU-intended run landing on the TPU and contending
        # with whatever owns the chip) — tell the operator.
        import sys as _sys

        print(
            "summarizer_tpu: WARNING: could not honor "
            f"JAX_PLATFORMS={_os.environ['JAX_PLATFORMS']!r} ({_e}); the "
            "process may be on an unintended backend",
            file=_sys.stderr,
        )

__version__ = "0.1.0"

FEATURE_DIM = 1024  # GoogLeNet pool5 descriptor size (datasets/README.md:46)
