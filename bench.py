"""Benchmark harness: flagship train throughput on the real chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: VASNet (the reference's flagship attention scorer,
summarizer/models/vasnet.py) supervised training throughput in videos/sec
under reference dynamics (batch-1 Adam step per video, T~TVSum-scale
sequences), on whatever device JAX provides (TPU under the driver).

``vs_baseline``: ratio against an in-process PyTorch implementation of the
same hot loop (the reference's per-video forward/MSE/backward/Adam step,
summarizer/models/logistic.py:61-89 structure with the VASNet forward),
measured on this host's CPU — the reference ships no GPU here and publishes
no throughput numbers (BASELINE.md), so its own runtime stack is the
baseline.  Extra sub-metrics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: repeated bench runs (and training runs in the
# same tree) skip recompilation entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N_VIDEOS = 32
T_STEPS = 320  # ~TVSum scale: 15x-subsampled frames (datasets/README.md:46)
D = 1024
EPOCHS_TIMED = 3


def make_data(rng):
    feats = rng.randn(N_VIDEOS, T_STEPS, D).astype(np.float32)
    targets = rng.rand(N_VIDEOS, T_STEPS).astype(np.float32)
    return feats, targets


def bench_jax(feats, targets):
    import jax
    import jax.numpy as jnp

    from summarizer_tpu.models import vasnet
    from summarizer_tpu.train.optim import torch_adam
    from summarizer_tpu.train.supervised import make_epoch_fn

    log(f"jax devices: {jax.devices()}")
    hp = {"input_size": D}
    params = vasnet.init(jax.random.PRNGKey(0), hp)
    opt = torch_adam(5e-5, 1e-5)
    opt_state = opt.init(params)
    epoch_fn = make_epoch_fn(vasnet.apply, hp, opt, True, 1)

    fx = jax.device_put(jnp.asarray(feats))
    tx = jax.device_put(jnp.asarray(targets))
    mx = jnp.ones((N_VIDEOS, T_STEPS), jnp.float32)
    perm = jnp.arange(N_VIDEOS)
    rng = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    params, opt_state, loss = epoch_fn(params, opt_state, fx, tx, mx, perm, rng)
    jax.block_until_ready(loss)
    log(f"compile+first epoch: {time.perf_counter() - t0:.2f}s  loss={float(loss):.5f}")

    t0 = time.perf_counter()
    for _ in range(EPOCHS_TIMED):
        params, opt_state, loss = epoch_fn(params, opt_state, fx, tx, mx, perm, rng)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    vps = N_VIDEOS * EPOCHS_TIMED / dt
    log(f"jax: {dt:.3f}s for {EPOCHS_TIMED} epochs -> {vps:.1f} videos/s")
    return vps


def bench_torch(feats, targets, n_videos=8):
    """Reference-style hot loop in torch on this host (per-video step)."""
    try:
        import torch
        import torch.nn as nn
    except Exception as e:  # pragma: no cover
        log(f"torch unavailable ({e}); vs_baseline=0")
        return None

    torch.manual_seed(0)

    class TorchVASNet(nn.Module):
        def __init__(self):
            super().__init__()
            d = D
            self.K = nn.Linear(d, d, bias=False)
            self.Q = nn.Linear(d, d, bias=False)
            self.V = nn.Linear(d, d, bias=False)
            self.out = nn.Linear(d, d, bias=False)
            self.k1 = nn.Linear(d, d)
            self.k2 = nn.Linear(d, 1)
            self.norm = nn.LayerNorm(d)
            self.drop = nn.Dropout(0.5)

        def forward(self, x):  # (T, D)
            q, k, v = self.Q(x), self.K(x), self.V(x)
            e = (q @ k.t()) / (D ** 0.5)
            a = self.drop(torch.softmax(e, dim=-1))
            c = self.out(a @ v)
            y = self.norm(self.drop(c + x))
            y = self.norm(self.drop(torch.relu(self.k1(y))))
            return torch.sigmoid(self.k2(y))

    model = TorchVASNet()
    optim = torch.optim.Adam(model.parameters(), lr=5e-5, weight_decay=1e-5)
    crit = nn.MSELoss()

    xs = [torch.from_numpy(feats[i]) for i in range(n_videos)]
    ys = [torch.from_numpy(targets[i]).unsqueeze(1) for i in range(n_videos)]

    # Warmup one video, then time
    s = model(xs[0])
    crit(s, ys[0]).backward()
    optim.step()
    t0 = time.perf_counter()
    for i in range(n_videos):
        optim.zero_grad()
        loss = crit(model(xs[i]), ys[i])
        loss.backward()
        optim.step()
    dt = time.perf_counter() - t0
    vps = n_videos / dt
    log(f"torch-cpu reference loop: {dt:.3f}s for {n_videos} videos -> {vps:.2f} videos/s")
    return vps


def bench_eval_latency():
    """p50 latency of the full on-device eval for one TVSum-like test fold."""
    import jax
    import jax.numpy as jnp

    from summarizer_tpu.data.batching import eval_static_dims, pack_eval
    from summarizer_tpu.data.hdf5 import VideoRecord
    from summarizer_tpu.data.synthetic import synth_video
    from summarizer_tpu.ops.eval_jax import evaluate_batch

    rng = np.random.RandomState(0)
    records = []
    for i in range(10):
        v = synth_video(rng, int(rng.randint(200, T_STEPS)), D, n_users=20)
        records.append(VideoRecord(key=f"v{i}", features=v["features"], gtscore=v["gtscore"],
                                   n_frames=int(v["n_frames"]), n_steps=int(v["n_steps"]),
                                   picks=v["picks"], change_points=v["change_points"],
                                   n_frame_per_seg=v["n_frame_per_seg"],
                                   user_scores=v["user_scores"], user_summary=v["user_summary"]))
    s, g, u, f, cap = eval_static_dims(records, 0.15)
    batch, _ = pack_eval(records, s, g, u, f)
    batch = jax.device_put(batch)
    scores = jax.device_put(jnp.asarray(rng.rand(len(records), s), jnp.float32))

    def run():
        out = evaluate_batch(scores, batch, proportion=0.15, method="knapsack",
                             max_capacity=cap, out_frames=f)
        jax.block_until_ready(out)

    run()  # compile
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    log(f"on-device eval (10 videos, 20 users, F={f}): p50 {p50 * 1e3:.1f} ms")
    return p50


def main():
    rng = np.random.RandomState(42)
    feats, targets = make_data(rng)
    vps = bench_jax(feats, targets)
    try:
        bench_eval_latency()
    except Exception as e:
        log(f"eval-latency bench failed: {e}")
    base = bench_torch(feats, targets)
    vs = (vps / base) if base else 0.0
    print(
        json.dumps(
            {
                "metric": "vasnet_train_throughput",
                "value": round(vps, 2),
                "unit": "videos/sec",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
