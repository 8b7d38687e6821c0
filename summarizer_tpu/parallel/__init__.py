"""Device-mesh parallelism.

The reference is strictly single-process single-GPU (SURVEY.md §2.4; the only
placement code is ``use_cuda``/``set_device``, summarizer/utils/
config.py:94-103).  Here parallel training is a first-class subsystem:

  - a 1-D/2-D ``jax.sharding.Mesh`` over ICI (``dp`` x ``tp``),
  - video-batch data parallelism (batch axis sharded over ``dp``; gradient
    psums are emitted by XLA from the shardings, no hand-written collectives),
  - Megatron-style tensor parallelism for the attention/FFN matmuls
    (column-parallel in-projections, row-parallel out-projections) declared
    purely through ``NamedSharding`` rules on the param pytree,
  - data-parallel full-dataset evaluation (eval_parallel.py),
  - sequence (context) parallelism (sequence_parallel.py): the time axis
    sharded over a mesh axis, with banded attention exchanging aperture-wide
    k/v halos via ``lax.ppermute`` and full attention all-gathering k/v —
    for Twitch-LOL-scale (and longer) videos whose activations outgrow one
    chip.  Composes with ``dp`` (batch axis on one mesh axis, T on another).

Deliberately absent: pipeline parallelism (the largest model is ~200 M
params — it fits one chip hundreds of times over; a pp axis would only add
bubbles) and expert parallelism (no MoE layers exist in this model family).
dp/tp/sp is what this workload can actually use.
"""

from summarizer_tpu.parallel.mesh import make_mesh  # noqa: F401
from summarizer_tpu.parallel.data_parallel import (  # noqa: F401
    make_sharded_train_step,
    param_shardings,
)
from summarizer_tpu.parallel.sequence_parallel import (  # noqa: F401
    make_sp_forward,
    make_sp_mesh,
    sp_attention,
    sp_vasnet_apply,
)
