"""Pipeline parallelism over an ICI mesh axis (transformer family).

A new capability relative to the reference (SURVEY.md §2.4: the reference
has no distributed backend at all): the transformer scorer's encoder stack
is split into ``pp`` stages of ``n_layers/pp`` consecutive layers, one stage
per device, and video microbatches stream through the stages GPipe-style.
Each tick every stage runs its layers on the microbatch it currently owns,
then hands the activation to its mesh neighbor with one ``lax.ppermute``
hop — the only cross-device traffic, O(mb * T * D) per tick over ICI.
Per-device parameter memory is O(n_layers/pp); this is the axis that scales
encoder DEPTH beyond one chip's HBM, complementing sequence parallelism
(time axis, parallel/sequence_parallel.py) and data/tensor parallelism
(parallel/data_parallel.py).

Schedule: ``n_micro + pp - 1`` ticks in a ``lax.scan``. Stage ``s`` at tick
``t`` processes microbatch ``t - s`` (bubble ticks compute on placeholder
slabs whose outputs are never selected, so they contribute exactly zero
gradient). The final stage's valid outputs are gathered with a masked psum.
Gradients need no hand-written schedule: AD transposes the ppermute (the
backward handoff runs the reverse ring) and the scan, yielding the standard
GPipe backward pipeline with all-microbatch gradient accumulation.

Losses/outputs are IDENTICAL to the single-device transformer
(models/transformer.py) up to float reassociation — microbatching splits the
batch axis only, and masked_mse means over the full batch commute. Parity is
pinned by tests/test_pipeline_parallel.py on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from summarizer_tpu.models.base import add_pos_embed
from summarizer_tpu.nn.attention import encoder_layer_apply
from summarizer_tpu.nn.core import dropout, layer_norm, linear


def make_pp_mesh(n_devices: int | None = None, axis: str = "pp") -> Mesh:
    """A 1-D pipeline mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (n_devices, len(devices))
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def stack_layers(layers: list) -> dict:
    """Stack a list of per-layer param dicts into one pytree with a leading
    layer axis — the axis sharded over ``pp``."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _index_layer(stacked, i):
    return jax.tree.map(lambda x: x[i], stacked)


def _pipeline_body(
    layers_loc,
    keys_loc,
    x_mb,
    mask_mb,
    *,
    axis: str,
    pp: int,
    n_micro: int,
    layers_per_stage: int,
    heads: int,
    rate: float,
    eps: float,
    train: bool,
    use_flash: bool,
):
    """Per-device shard_map body: run the GPipe tick loop.

    ``layers_loc``/``keys_loc`` carry this stage's ``layers_per_stage``
    layers (leading axis already partitioned by shard_map); ``x_mb``
    (n_micro, mb, T, D) and ``mask_mb`` are replicated.
    """
    s = lax.axis_index(axis)
    # Stage handoff ring: non-cyclic, so stage 0 receives zeros during the
    # drain and the last stage's output leaves via the collected ys instead.
    perm = [(i, i + 1) for i in range(pp - 1)]

    def tick(state, t):
        my_mb = jnp.clip(t - s, 0, n_micro - 1)
        h = jnp.where(s == 0, x_mb[my_mb], state)
        mask = mask_mb[my_mb]
        for i in range(layers_per_stage):
            h = encoder_layer_apply(
                _index_layer(layers_loc, i),
                h,
                heads,
                mask,
                rng=keys_loc[i, my_mb],
                train=train,
                rate=rate,
                eps=eps,
                flash=use_flash,
            )
        nxt = lax.ppermute(h, axis, perm) if pp > 1 else h
        return nxt, h

    state0 = jnp.zeros_like(x_mb[0])
    _, outs = lax.scan(tick, state0, jnp.arange(n_micro + pp - 1))
    # Stage pp-1 produced microbatch j at tick j + pp - 1.
    valid = lax.dynamic_slice_in_dim(outs, pp - 1, n_micro, axis=0)
    valid = jnp.where(s == pp - 1, valid, jnp.zeros_like(valid))
    return lax.psum(valid, axis)


def pp_transformer_apply(
    params,
    x,
    mask,
    *,
    mesh: Mesh,
    n_micro: int | None = None,
    axis: str = "pp",
    rng=None,
    train: bool = False,
    hp: dict | None = None,
):
    """Transformer scorer forward with the encoder stack pipeline-parallel
    over ``mesh[axis]``.  Drop-in for models.transformer.apply: positional
    embedding, the shared final/head LayerNorm, ``more_residuals``, and the
    k1/k2 head (reference summarizer/models/transformer.py:18-103 semantics)
    run replicated outside the pipeline — only the layer stack is staged.

    ``params["layers"]`` may be the standard per-layer list (stacked here;
    the engine path) or an already-stacked pytree from ``stack_layers``
    sharded P(axis) (the programmatic path).  Requires
    ``n_layers % pp == 0`` and ``B % n_micro == 0``; ``n_micro`` defaults to
    ``pp`` (one in-flight microbatch per stage).
    """
    from summarizer_tpu.models import transformer

    hp = {**transformer.DEFAULTS, **(hp or {})}
    heads = int(hp["attention_heads"])
    eps = float(hp["epsilon"])
    rate = float(hp["dropout"])
    n_layers = int(hp["encoder_layers"])
    pp = mesh.shape[axis]
    if n_micro is None:
        n_micro = pp
    assert n_layers % pp == 0, (
        f"encoder_layers {n_layers} must divide over pp={pp} stages"
    )
    b, t, d = x.shape
    assert b % n_micro == 0, f"batch {b} not divisible into {n_micro} microbatches"
    layers_per_stage = n_layers // pp

    stacked = params["layers"]
    if isinstance(stacked, (list, tuple)):
        stacked = stack_layers(list(stacked))

    # Same flash policy as the dense apply (models/transformer.py:80-85).
    flash = hp.get("flash", "auto")
    lane_ok = d % heads == 0 and (d // heads) % 128 == 0
    use_flash = lane_ok and (t >= 1024 if flash == "auto" else bool(int(flash)))

    # Per-(layer, microbatch) dropout keys, sharded with their layers.  The
    # sequential apply draws one key per layer for the whole batch
    # (models/transformer.py:78); with the batch split into microbatches the
    # mask shapes differ, so pp dropout is a different (equally valid) draw.
    if rng is not None:
        rng, k_head = jax.random.split(rng)
        keys = jax.random.split(rng, n_layers * n_micro).reshape(
            n_layers, n_micro, -1
        )
    else:
        k_head = None
        keys = jnp.zeros((n_layers, n_micro, 2), jnp.uint32)

    x = add_pos_embed(params.get("pos"), x)
    mb = b // n_micro
    x_mb = x.reshape(n_micro, mb, t, d)
    mask_mb = mask.reshape(n_micro, mb, t)

    body = partial(
        _pipeline_body,
        axis=axis, pp=pp, n_micro=n_micro, layers_per_stage=layers_per_stage,
        heads=heads, rate=rate, eps=eps, train=train, use_flash=use_flash,
    )
    h = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(stacked, keys, x_mb, mask_mb)
    h = h.reshape(b, t, d)

    h = layer_norm(params["norm"], h, eps)
    if hp["more_residuals"]:
        h = h + x
    y = jax.nn.relu(linear(params["k1"], h))
    y = dropout(k_head, y, float(hp["head_dropout"]), train)
    y = layer_norm(params["norm"], y, eps)
    return jax.nn.sigmoid(linear(params["k2"], y))[..., 0]


def pp_param_shardings(params, mesh: Mesh, axis: str = "pp"):
    """Shardings for stacked-layer transformer params: the layer axis over
    ``pp``, everything else (pos embed, shared norm, head) replicated."""
    staged = jax.tree.map(
        lambda _: NamedSharding(mesh, P(axis)), params["layers"]
    )
    out = {
        k: (staged if k == "layers" else jax.tree.map(
            lambda _: NamedSharding(mesh, P()), v))
        for k, v in params.items()
    }
    return out


def make_pp_forward(hp: dict, mesh: Mesh, n_micro: int | None = None,
                    axis: str = "pp"):
    """Jitted pipeline-parallel forward: returns (fwd, shard_params).

    ``shard_params`` stacks the per-layer list and lays the layer axis over
    the mesh — each device holds only its stage's weights.  ``fwd(params, x,
    mask)`` runs eval-mode scoring.
    """

    @jax.jit
    def fwd(params, x, mask):
        return pp_transformer_apply(
            params, x, mask, mesh=mesh, n_micro=n_micro, axis=axis,
            rng=None, train=False, hp=hp,
        )

    def shard_params(params):
        params = {**params}
        if isinstance(params["layers"], (list, tuple)):
            params["layers"] = stack_layers(list(params["layers"]))
        return jax.device_put(params, pp_param_shardings(params, mesh, axis))

    return fwd, shard_params


def make_pp_train_step(hp: dict, optimizer, mesh: Mesh,
                       n_micro: int | None = None, axis: str = "pp"):
    """Jitted supervised train step with the encoder stack pipeline-staged.

    Same masked-MSE/Adam semantics as the dense step (train/supervised.py):
    the loss means over the full batch, so microbatch gradients accumulate
    through the transposed pipeline into exactly the full-batch gradient (up
    to float reassociation).  Optimizer state inherits the stage shardings
    from the params.  Returns (step, shard_params).
    """
    import optax

    from summarizer_tpu.train.supervised import masked_mse

    def loss_fn(params, x, t, m, rng):
        scores = pp_transformer_apply(
            params, x, m, mesh=mesh, n_micro=n_micro, axis=axis,
            rng=rng, train=True, hp=hp,
        )
        return masked_mse(scores, t, m)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, t, m, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, t, m, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_params(params):
        params = {**params}
        if isinstance(params["layers"], (list, tuple)):
            params["layers"] = stack_layers(list(params["layers"]))
        return jax.device_put(params, pp_param_shardings(params, mesh, axis))

    return step, shard_params
