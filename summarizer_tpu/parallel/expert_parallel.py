"""Expert parallelism over an ICI mesh axis (transformer_moe family).

A new capability relative to the reference (SURVEY.md §2.4: no distributed
backend exists there): the MoE scorer's stacked expert bank (nn/moe.py,
leading E axis) is sharded over an ``ep`` mesh axis — each device holds and
contracts only E/ep experts' weights, so expert capacity scales with the
mesh while per-device FLOPs and parameter HBM stay constant.  Tokens stay
replicated (they are small: B·T·D activations vs E·2·D·d_ff weights); the
only cross-device traffic is one output psum per MoE layer over ICI.  This
complements data parallelism (video axis), tensor parallelism (matmul
shards), sequence parallelism (time axis), and pipeline parallelism (layer
axis) — parallel/{data,sequence,pipeline}_parallel.py.

The router (gate) is replicated and computed identically on every device,
so top-k selection, combine weights, and the load-balance aux loss are
bit-identical to the single-device path; only the expert contraction is
partitioned.  Parity is pinned by tests/test_expert_parallel.py on the
virtual 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from summarizer_tpu.nn.moe import moe_expert_ffn


def make_ep_mesh(n_devices: int | None = None, axis: str = "ep") -> Mesh:
    """A 1-D expert-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (n_devices, len(devices))
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def _ep_body(w1, b1, w2, b2, x, combine, *, axis: str):
    """Per-device: contract the LOCAL expert slice against all (replicated)
    tokens, weight by this slice's combine columns, psum the mixtures."""
    import jax.numpy as jnp

    ys = moe_expert_ffn(w1, b1, w2, b2, x)  # (B, T, E_loc, D)
    y = jnp.einsum("bted,bte->btd", ys, combine)
    return lax.psum(y, axis)


def ep_expert_override(mesh: Mesh, axis: str = "ep"):
    """The ``moe_override`` hook for models/transformer_moe.py: shard the
    expert axis of the bank and of the router's combine matrix over
    ``mesh[axis]``.  ``n_experts % ep == 0`` required."""
    ep = mesh.shape[axis]

    def override(w1, b1, w2, b2, x, combine):
        n_experts = w1.shape[0]
        assert n_experts % ep == 0, (
            f"n_experts {n_experts} must divide over ep={ep} devices"
        )
        return jax.shard_map(
            partial(_ep_body, axis=axis),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(None, None, axis)),
            out_specs=P(),
            check_vma=False,
        )(w1, b1, w2, b2, x, combine)

    return override


def ep_param_shardings(params, mesh: Mesh, axis: str = "ep"):
    """Shardings for transformer_moe params: every expert-stacked leaf
    (moe w1/b1/w2/b2, leading E axis) over ``ep``; router, attention,
    norms, head replicated."""
    expert = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def layer_sharding(layer):
        out = {}
        for k, v in layer.items():
            if k == "moe":
                out[k] = {
                    kk: (expert if kk != "gate" else jax.tree.map(lambda _: repl, vv))
                    for kk, vv in v.items()
                }
            else:
                out[k] = jax.tree.map(lambda _: repl, v)
        return out

    return {
        k: ([layer_sharding(l) for l in v] if k == "layers"
            else jax.tree.map(lambda _: repl, v))
        for k, v in params.items()
    }


def make_ep_forward(hp: dict, mesh: Mesh, axis: str = "ep"):
    """Jitted expert-parallel forward: returns (fwd, shard_params).

    ``shard_params`` lays every expert bank's E axis over the mesh — each
    device holds only its experts' weights.  ``fwd(params, x, mask)`` runs
    eval-mode scoring, output identical to the replicated apply."""
    from summarizer_tpu.models import transformer_moe

    hp = {**hp, "moe_override": ep_expert_override(mesh, axis)}

    @jax.jit
    def fwd(params, x, mask):
        return transformer_moe.apply(params, x, mask, rng=None, train=False, hp=hp)

    def shard_params(params):
        return jax.device_put(params, ep_param_shardings(params, mesh, axis))

    return fwd, shard_params


def make_ep_train_step(hp: dict, optimizer, mesh: Mesh, axis: str = "ep"):
    """Jitted supervised train step with expert-sharded params: masked MSE +
    the router load-balance aux (weight hp['aux_weight']), one Adam step.
    Optimizer state inherits the expert shardings from the params.
    Returns (step, shard_params)."""
    import optax

    from summarizer_tpu.models import transformer_moe
    from summarizer_tpu.train.supervised import masked_mse

    hp = {**hp, "moe_override": ep_expert_override(mesh, axis)}

    def loss_fn(params, x, t, m, rng):
        scores, aux = transformer_moe.apply_with_aux(
            params, x, m, rng=rng, train=True, hp=hp
        )
        hp_full = {**transformer_moe.DEFAULTS, **hp}
        return masked_mse(scores, t, m) + float(hp_full["aux_weight"]) * aux

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, t, m, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, t, m, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_params(params):
        return jax.device_put(params, ep_param_shardings(params, mesh, axis))

    return step, shard_params
