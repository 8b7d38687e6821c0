"""Optimizers with torch semantics.

The reference trains everything with ``torch.optim.Adam(lr, weight_decay)``
(e.g. summarizer/models/logistic.py:52-55): L2 weight decay is *added to the
gradient before* the Adam moments (not AdamW), and DSN/SumGAN clip the global
grad norm at 5.0 *before* the optimizer sees it (dsn.py:145, sumgan.py:433).
The optax chain below reproduces that ordering exactly.
"""

from __future__ import annotations

import optax


def torch_adam(
    lr: float,
    weight_decay: float = 0.0,
    clip_norm: float | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    txs = []
    if clip_norm is not None:
        txs.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    txs.append(optax.scale(-lr))
    return optax.chain(*txs)
