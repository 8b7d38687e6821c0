"""Mixture-of-experts FFN with top-k gating (new TPU-native capability).

The reference's transformer scorer has a single dense FFN per encoder layer
(summarizer/models/transformer.py:49-50, via torch's TransformerEncoderLayer);
this module generalizes it to E experts with a learned top-k router and a
Switch-Transformer-style load-balance auxiliary loss, giving the scorer
O(E) parameter capacity at O(top_k) per-token nominal compute.

TPU design notes:
- Expert weights are STACKED with a leading E axis — one (E, d, d_ff) tensor
  instead of a list — so the whole bank contracts in a single batched einsum
  the MXU tiles well, and so expert parallelism is one sharding annotation
  (the E axis laid over an ``ep`` mesh axis, parallel/expert_parallel.py).
- Dense dispatch: every expert computes every token and the router's
  combine weights (zero outside the top-k) select the mixture.  At this
  framework's scale (T <= ~3.2k, d = 1024, E <= 8) the (B, T, E, d_ff)
  hidden tensor is small, the einsums stay MXU-shaped, and there is no
  capacity-overflow token dropping or all_to_all latency to tune; compute
  scales 1/ep per device under expert parallelism because each device
  contracts only its local expert slice.  A sparse all_to_all dispatch only
  pays off when E >> top_k at much larger token counts.
- No data-dependent shapes anywhere: top_k selection becomes a dense
  (B, T, E) combine matrix via one_hot, so the whole layer jits and shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from summarizer_tpu.nn.core import linear_init, torch_linear_weight


def moe_ffn_init(rng, d_model: int, d_ff: int, n_experts: int):
    """Stacked-expert FFN + router params.

    Each expert's two matrices draw from the same torch nn.Linear
    distribution as the dense FFN (nn/core.py:torch_linear_weight), so a
    1-expert MoE is distribution-identical to the dense layer it replaces.
    """
    ks = jax.random.split(rng, 2 * n_experts + 1)
    w1 = jnp.stack(
        [torch_linear_weight(ks[i], (d_model, d_ff)) for i in range(n_experts)]
    )
    w2 = jnp.stack(
        [
            torch_linear_weight(ks[n_experts + i], (d_ff, d_model))
            for i in range(n_experts)
        ]
    )
    return {
        "gate": linear_init(ks[-1], d_model, n_experts, bias=False),
        "w1": w1,
        "b1": jnp.zeros((n_experts, d_ff), jnp.float32),
        "w2": w2,
        "b2": jnp.zeros((n_experts, d_model), jnp.float32),
    }


def moe_gate(gate_p, x, mask, top_k: int):
    """Router: top-k gate over experts.

    Returns ``combine`` (B, T, E) — renormalized top-k probabilities, zero
    outside the top-k and on padded steps — and the Switch load-balance
    auxiliary ``aux = E * sum_e f_e * P_e`` over VALID tokens only, where
    f_e is the fraction of tokens whose top-1 expert is e and P_e the mean
    gate probability (Fedus et al., arXiv:2101.03961 eq. 4-6; a padded step
    must not count as "routed" or short videos would skew the balance).
    """
    n_experts = gate_p["w"].shape[-1]
    logits = jnp.dot(x, gate_p["w"], preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # (B, T, E)

    vals, idx = jax.lax.top_k(probs, top_k)  # (B, T, k)
    vals = vals / jnp.maximum(vals.sum(-1, keepdims=True), 1e-9)
    combine = (jax.nn.one_hot(idx, n_experts) * vals[..., None]).sum(-2)
    combine = combine * mask[..., None]

    valid = jnp.maximum(mask.sum(), 1.0)
    top1 = jax.nn.one_hot(idx[..., 0], n_experts) * mask[..., None]
    f = top1.sum((0, 1)) / valid
    p_mean = (probs * mask[..., None]).sum((0, 1)) / valid
    aux = n_experts * jnp.sum(f * p_mean)
    return combine, aux


def moe_expert_ffn(w1, b1, w2, b2, x):
    """All experts' two-layer ReLU FFN on all tokens, one batched einsum
    pair: (B, T, D) x (E, D, F) -> (B, T, E, D)."""
    h = jnp.einsum("btd,edf->btef", x, w1, preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + b1)
    y = jnp.einsum("btef,efd->bted", h, w2, preferred_element_type=jnp.float32)
    return y + b2


def moe_ffn_apply(p, x, mask, *, top_k: int = 2, expert_override=None):
    """(B, T, D), (B, T) -> ((B, T, D), aux_loss).

    ``expert_override(w1, b1, w2, b2, x, combine)`` replaces the dense
    expert contraction + combine — the expert-parallel hook
    (parallel/expert_parallel.py), which shards the E axis over the mesh.
    """
    combine, aux = moe_gate(p["gate"], x, mask, top_k)
    if expert_override is not None:
        y = expert_override(p["w1"], p["b1"], p["w2"], p["b2"], x, combine)
    else:
        ys = moe_expert_ffn(p["w1"], p["b1"], p["w2"], p["b2"], x)
        y = jnp.einsum("bted,bte->btd", ys, combine)
    return y, aux
