"""Lockstep parity for the RL family: replay the reference torch stack's
DSN training trajectory through the TPU engine's REINFORCE math.

Unlike the logistic/VASNet lockstep (which replays the reference's RNG
*plan*), DSN's stochasticity lives in the per-episode Bernoulli draws, so
the reference run is CAPTURED instead: parity_ref_worker.py with
``capture_dsn`` records, per fold, the initial DSN state_dict, the
per-epoch shuffled key orders (summarizer/models/dsn.py:93), and every
episode's sampled actions (dsn.py:126).  This script feeds that exact
trajectory — converted weights, same video order, same actions — through a
jitted replay of train/reinforce.py's per-video update chain (policy
gradient with per-video EMA baselines, beta-regularizer, clip 5.0, torch
Adam), then evaluates with the engine's on-device eval at the same cadence.

With ALL stochasticity injected, any residual delta vs the reference's
captured per-fold (corr, avgF1, maxF1) triplets is pure float accumulation
(XLA vs torch-CPU BLAS) chained over epochs x videos x episodes — the
strongest offline evidence that the REINFORCE engine is numerically
interchangeable with the reference (VERDICT item 2, RL family).

Runs on CPU jax so it neither contends with nor depends on the tunneled
TPU worker; the engine code path is the same XLA program.

Usage:
  python scripts/parity_lockstep_dsn.py            # capture (if absent) + replay
  python scripts/parity_lockstep_dsn.py --sup      # DSN_sup variant
"""

import json
import os
import pickle
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SEED = 12345
EPOCHS = 20
TEST_EVERY = 2
NUM_EPISODES = 5
SPLITS = ["splits/tvsum_splits.json", "splits/summe_splits.json"]
RESULTS = os.path.join(REPO, "parity", "results.jsonl")


def run_capture(sup: bool, cap_path: str) -> None:
    """Run the reference DSN trainer offline with trajectory capture."""
    cfg = {
        "name": "dsn_sup-lockstep-ref" if sup else "dsn-lockstep-ref",
        "model": "dsn",
        "splits_files": list(SPLITS),
        "epochs": EPOCHS,
        "test_every_epochs": TEST_EVERY,
        "seed": SEED,
        "workdir": os.path.join(REPO, "parity", "work_dsn"),
        "capture_dsn": cap_path,
        "log_level": "info",  # per-fold triplets parsed from stdout
        "extra_params": {"sup": 1} if sup else {},
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_ref_worker.py"),
         json.dumps(cfg)],
        capture_output=True, text=True, check=True,
    )
    # Per-fold triplets from the reference driver's own log lines
    # (summarizer/main.py:38-43).
    folds = re.findall(
        r"File: (\S+)\s+Fold: (\d)/\d\s+Corr:\s*(-?[\d.]+)\s+"
        r"Avg F-score: ([\d.]+)\s+Max F-score: ([\d.]+)",
        out.stdout + out.stderr,
    )
    with open(cap_path, "rb") as f:
        blob = pickle.load(f)
    blob["ref_folds"] = [
        {"splits_file": os.path.basename(sf), "fold": int(k) - 1,
         "corr": float(c), "avg_f1": float(a), "max_f1": float(m)}
        for sf, k, c, a, m in folds
    ]
    with open(cap_path, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


def dsn_params_from_state_dict(sd):
    """Reference DSN state_dict -> our pytree (models/dsn.py layout):
    1-layer bidirectional LSTM + linear head (dsn.py:17-47)."""
    j = lambda a: jnp.asarray(np.asarray(a))  # noqa: E731
    entry = {}
    for direction, tag in (("fwd", ""), ("bwd", "_reverse")):
        entry[direction] = {
            "w_ih": j(sd[f"rnn.weight_ih_l0{tag}"].T),
            "w_hh": j(sd[f"rnn.weight_hh_l0{tag}"].T),
            "b_ih": j(sd[f"rnn.bias_ih_l0{tag}"]),
            "b_hh": j(sd[f"rnn.bias_hh_l0{tag}"]),
        }
    return {
        "rnn": {"layers": [entry]},
        "out": {"w": j(sd["out.0.weight"].T), "b": j(sd["out.0.bias"])},
    }


def make_replay_epoch(optimizer, hp, sup: bool):
    """One epoch of the reference DSN update chain with INJECTED actions:
    identical to train/reinforce.py's epoch program except episodes use the
    captured Bernoulli draws instead of sampling."""
    from summarizer_tpu.models import dsn
    from summarizer_tpu.train.reinforce import bce_masked, compute_reward

    import optax

    beta = float(int(0.01))  # reference truncation quirk (dsn.py:52)
    eps = 0.5

    def video_step(carry, inp):
        params, opt_state, baselines = carry
        x, t, m, idx, acts = inp  # acts: (E, T) captured actions

        def loss_fn(params):
            probs = dsn.apply(params, x[None], m[None], rng=None, train=True,
                              hp=hp)[0]
            pmean = (probs * m).sum() / jnp.maximum(m.sum(), 1.0)
            loss = beta * (pmean - eps) ** 2
            if sup:
                loss = loss + bce_masked(probs, t, m)

            def episode(actions):
                logp = actions * jnp.log(jnp.maximum(probs, 1e-12)) + (
                    1.0 - actions
                ) * jnp.log(jnp.maximum(1.0 - probs, 1e-12))
                logp_mean = (logp * m).sum() / jnp.maximum(m.sum(), 1.0)
                reward = jax.lax.stop_gradient(
                    compute_reward(x, actions, m, False, 20)
                )
                return -logp_mean * (reward - baselines[idx]), reward

            pg, rewards = jax.vmap(episode)(acts)
            return (loss + pg.sum()) / float(NUM_EPISODES), rewards.mean()

        (loss, reward), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        baselines = baselines.at[idx].set(0.9 * baselines[idx] + 0.1 * reward)
        return (params, opt_state, baselines), (loss, reward)

    @jax.jit
    def epoch(params, opt_state, baselines, feats, targets, mask, perm, acts):
        xs = (feats[perm], targets[perm], mask[perm], perm, acts)
        (params, opt_state, baselines), (losses, rewards) = jax.lax.scan(
            video_step, (params, opt_state, baselines), xs
        )
        return params, opt_state, baselines, losses.mean(), rewards.mean()

    return epoch


def main():
    sup = "--sup" in sys.argv
    os.chdir(REPO)
    tag = "dsn_sup" if sup else "dsn"
    cap_path = os.path.join(REPO, "parity", f"{tag}_capture.pkl")
    if not os.path.exists(cap_path):
        print(f"[lockstep-dsn] capturing reference trajectory -> {cap_path}",
              flush=True)
        run_capture(sup, cap_path)
    with open(cap_path, "rb") as f:
        blob = pickle.load(f)
    cap, ref = blob["cap"], blob["result"]

    from summarizer_tpu.data.batching import pack_train
    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.train.loop import make_engine
    from summarizer_tpu.train.optim import torch_adam
    from summarizer_tpu.utils.config import HParameters

    hps = HParameters().load_from_args(
        {
            "model": "dsn",
            "splits_files": list(SPLITS),
            "epochs": EPOCHS,
            "test_every_epochs": TEST_EVERY,
            "log_level": "error",
            "tensorboard": False,
            "seed": SEED,
            "extra_params": {"sup": 1} if sup else {},
        }
    )
    hp = {"input_size": 1024, "hidden_size": 256, "num_layers": 1,
          "cell": "lstm"}

    inits = iter(cap["inits"])
    orders = iter(cap["orders"])
    actions = iter(cap["actions"])

    t0 = time.time()
    rows, fold_rows = [], []
    for sf in hps.splits_files:
        dataset = SummarizerDataset(hps.dataset_of_file[sf])
        engine = make_engine(hps, dataset, hps.dataset_name_of_file[sf])
        optimizer = torch_adam(float(hps.lr), float(hps.weight_decay),
                               clip_norm=5.0)
        epoch_fn = make_replay_epoch(optimizer, hp, sup)
        splits = hps.splits_of_file[sf]
        corrs, af1s, mf1s = [], [], []
        for fold, split in enumerate(splits):
            train_keys = list(split["train_keys"])
            key_index = {k: i for i, k in enumerate(train_keys)}
            n = len(train_keys)
            pack = pack_train(dataset.subset(train_keys), t_max=engine.t_max)
            feats = jnp.asarray(pack.features)
            targets = jnp.asarray(pack.targets)
            mask = jnp.asarray(pack.mask)
            lengths = pack.mask.sum(-1).astype(int)

            params = dsn_params_from_state_dict(next(inits))
            opt_state = optimizer.init(params)
            baselines = jnp.zeros(n, jnp.float32)
            eval_fn = engine.make_eval_fn(list(split["test_keys"]))

            best_corr, best_a, best_m = -1.0, 0.0, 0.0
            k_ev = jax.random.PRNGKey(0)  # eval forward is deterministic
            for epoch in range(EPOCHS):
                order = [key_index[k] for k in next(orders)]
                perm = jnp.asarray(np.asarray(order, np.int32))
                acts = np.zeros((n, NUM_EPISODES, engine.t_max), np.float32)
                for vi, video in enumerate(order):
                    for e in range(NUM_EPISODES):
                        a = next(actions)
                        assert len(a) == lengths[video], (
                            f"captured action length {len(a)} != video length "
                            f"{lengths[video]} (fold {fold}, epoch {epoch})"
                        )
                        acts[vi, e, : len(a)] = a
                params, opt_state, baselines, loss, reward = epoch_fn(
                    params, opt_state, baselines, feats, targets, mask, perm,
                    jnp.asarray(acts),
                )
                if epoch % TEST_EVERY == 0:
                    corr, a, m = eval_fn(params, k_ev)
                    best_a, best_m = max(best_a, a), max(best_m, m)
                    if corr > best_corr:
                        best_corr = corr
            corrs.append(best_corr)
            af1s.append(best_a)
            mf1s.append(best_m)
            fold_rows.append(
                {"splits_file": os.path.basename(sf), "fold": fold,
                 "corr": round(float(best_corr), 5),
                 "avg_f1": round(float(best_a), 5),
                 "max_f1": round(float(best_m), 5)}
            )
            print(
                f"[lockstep-dsn] {os.path.basename(sf)} fold {fold}: "
                f"corr {best_corr:.5f} avgF1 {best_a:.5f} maxF1 {best_m:.5f}",
                flush=True,
            )
        next(inits)  # predict-time reset (main.py:65) — weights unused
        rows.append(
            {
                "splits_file": os.path.basename(sf),
                "corr": round(float(np.mean(corrs)), 5),
                "avg_f1": round(float(np.mean(af1s)), 5),
                "max_f1": round(float(np.mean(mf1s)), 5),
            }
        )
    for it, name in ((inits, "inits"), (orders, "orders"), (actions, "actions")):
        leftover = sum(1 for _ in it)
        assert leftover == 0, f"{leftover} unconsumed captured {name}"

    out = {
        "stack": f"summarizer_tpu-{jax.devices()[0].platform}-lockstep",
        "name": f"{tag}-lockstep",
        "model": "dsn",
        "epochs": EPOCHS,
        "seed": SEED,
        "wall_s": round(time.time() - t0, 1),
        "results": rows,
        "fold_results": fold_rows,
        "ref_fold_results": blob.get("ref_folds", []),
        "ref_results": ref.get("results", []),
    }
    with open(RESULTS, "a") as f:
        f.write(json.dumps(out) + "\n")
    print("PARITY_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
