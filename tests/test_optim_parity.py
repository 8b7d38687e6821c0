"""End-to-end optimizer-trajectory parity vs torch.

Runs the reference's exact training recipe (per-video MSE + Adam with
coupled weight decay, summarizer/models/logistic.py:52-86) in torch and in
our supervised scan-epoch with identical weights and video order, then
compares the resulting parameters.  This pins the full update chain: masked
loss == nn.MSELoss, add_decayed_weights+scale_by_adam == torch.optim.Adam,
per-video stepping inside ``lax.scan``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from summarizer_tpu.train.optim import torch_adam  # noqa: E402
from summarizer_tpu.train.supervised import make_epoch_fn  # noqa: E402
from summarizer_tpu.models import logistic  # noqa: E402


def test_logistic_training_matches_torch():
    d, n, t = 32, 5, 20
    lr, wd = 1e-3, 1e-4
    rng = np.random.RandomState(0)
    feats = rng.randn(n, t, d).astype(np.float32)
    targets = rng.rand(n, t).astype(np.float32)
    w0 = rng.randn(d, 1).astype(np.float32) * 0.1
    b0 = rng.randn(1).astype(np.float32) * 0.1

    # ---- torch: reference loop (one Adam step per video, fixed order)
    model = torch.nn.Linear(d, 1)
    with torch.no_grad():
        model.weight.copy_(torch.from_numpy(w0.T))
        model.bias.copy_(torch.from_numpy(b0))
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd)
    crit = torch.nn.MSELoss()
    for _ in range(3):  # epochs
        for i in range(n):
            x = torch.from_numpy(feats[i])
            y = torch.from_numpy(targets[i]).unsqueeze(1)
            opt.zero_grad()
            loss = crit(torch.sigmoid(model(x)), y)
            loss.backward()
            opt.step()
    w_torch = model.weight.detach().numpy().T
    b_torch = model.bias.detach().numpy()

    # ---- ours: scan epoch, same order (identity permutation)
    params = {"head": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}}
    optimizer = torch_adam(lr, wd)
    opt_state = optimizer.init(params)
    epoch_fn = make_epoch_fn(logistic.apply, {}, optimizer, True, 1)
    fx, tx = jnp.asarray(feats), jnp.asarray(targets)
    mx = jnp.ones((n, t))
    perm = jnp.arange(n)
    for _ in range(3):
        params, opt_state, _ = epoch_fn(
            params, opt_state, fx, tx, mx, perm, jax.random.PRNGKey(0)
        )

    np.testing.assert_allclose(np.asarray(params["head"]["w"]), w_torch, atol=3e-5)
    np.testing.assert_allclose(np.asarray(params["head"]["b"]), b_torch, atol=3e-5)


def test_grad_clip_ordering_matches_torch():
    """clip_grad_norm_(5.0) happens BEFORE Adam's coupled weight decay
    (summarizer/models/dsn.py:142-146); pin the optax chain ordering."""
    import optax

    d = 16
    lr, wd, clip = 1e-2, 1e-3, 0.05  # tiny clip so it actually binds
    rng = np.random.RandomState(1)
    w0 = rng.randn(d).astype(np.float32)
    g = rng.randn(d).astype(np.float32) * 10.0  # large grad -> clipped

    # torch
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([p], lr=lr, weight_decay=wd)
    p.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_norm_([p], clip)
    opt.step()

    # ours
    params = {"w": jnp.asarray(w0)}
    tx = torch_adam(lr, wd, clip_norm=clip)
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
    ours = np.asarray(optax.apply_updates(params, updates)["w"])

    np.testing.assert_allclose(ours, p.detach().numpy(), atol=1e-6)
