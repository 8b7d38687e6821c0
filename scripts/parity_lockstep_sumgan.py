"""Lockstep parity for the adversarial family: replay the reference torch
stack's SumGAN training trajectory through this repo's math.

Like the DSN lockstep (scripts/parity_lockstep_dsn.py), the reference run is
CAPTURED, not RNG-replicated: parity_ref_worker.py with ``capture_sumgan``
records, per fold, the initial SumGAN state_dict, every shuffle order
(pretrain + train epochs, summarizer/models/sumgan.py:330/398), and every
torch tensor draw in call order — the VAE reparameterization eps
(sumgan.py:134), the uniform-score branch (sumgan.py:177), and the
discriminator input noise (sumgan.py:466-468).  This script feeds that exact
trajectory — converted weights, same orders, same noise tensors — through a
replay of the engine's 3-phase update chain.

Crucially, the replay reproduces the reference's GRAD-ACCUMULATION quirk
exactly (QUIRKS.md #11): each phase's ``optimizer.zero_grad()`` clears only
its own parameter subset, so ``clip_grad_norm_(model.parameters(), 5.0)``
measures a norm including stale, re-scaled grads accumulated from earlier
phases, earlier videos, and the tail of VAE pretraining.  The replay carries
that accumulated-grad pytree (zero the stepped subset -> add fresh grads ->
torch clip ``min(1, 5/(norm+1e-6))`` scaling the WHOLE tree in place ->
masked torch-Adam step on the subset).  The production engine intentionally
clips fresh full-tree grads instead (train/adversarial.py — see QUIRKS.md);
this harness exists to prove the remaining machinery is numerically
interchangeable with the reference.

Protocol: the 1-fold small overfit split (6 videos, train==test — the
reference's own minimal-example protocol), shrunken widths through the SAME
extra_params both stacks expose (run_parity.py's sumgan-overfit config),
epochs 5 (so ``epoch_noise = int(0.2*5) = 1`` exercises the input-noise
replay path), VAE pretrain 2.

Usage:
  python scripts/parity_lockstep_sumgan.py          # capture (if absent) + replay
  python scripts/parity_lockstep_sumgan.py --sup    # SumGAN_sup variant
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
import optax  # noqa: E402

SEED = 12345
EPOCHS = 5
PRETRAIN = 2
TEST_EVERY = 1
SPLITS = ["splits/summe_splits_overfit_small.json"]
WIDTHS = {"sLSTM_hidden_size": 128, "edLSTM_hidden_size": 256,
          "cLSTM_hidden_size": 128}
SIGMA = 0.3
RESULTS = os.path.join(REPO, "parity", "results.jsonl")


def run_capture(sup: bool, cap_path: str) -> None:
    cfg = {
        "name": "sumgan_sup-lockstep-ref" if sup else "sumgan-lockstep-ref",
        "model": "sumgan",
        "splits_files": list(SPLITS),
        "epochs": EPOCHS,
        "test_every_epochs": TEST_EVERY,
        "seed": SEED,
        "workdir": os.path.join(REPO, "parity", "work_sumgan"),
        "capture_sumgan": cap_path,
        "log_level": "info",  # per-fold triplets parsed from stdout
        "extra_params": {**WIDTHS, "pretrain_vae": PRETRAIN,
                         **({"sup": 1} if sup else {})},
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_ref_worker.py"),
         json.dumps(cfg)],
        capture_output=True, text=True, check=True,
    )
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


def params_from_state_dict(sd):
    """Reference SumGAN state_dict -> models/sumgan.py pytree layout."""
    j = lambda a: jnp.asarray(np.asarray(a))  # noqa: E731

    def rnn(prefix, layers, bidir):
        out = []
        for layer in range(layers):
            entry = {}
            for direction, tag in (("fwd", ""), ("bwd", "_reverse")):
                if direction == "bwd" and not bidir:
                    continue
                entry[direction] = {
                    "w_ih": j(sd[f"{prefix}.weight_ih_l{layer}{tag}"].T),
                    "w_hh": j(sd[f"{prefix}.weight_hh_l{layer}{tag}"].T),
                    "b_ih": j(sd[f"{prefix}.bias_ih_l{layer}{tag}"]),
                    "b_hh": j(sd[f"{prefix}.bias_hh_l{layer}{tag}"]),
                }
            out.append(entry)
        return {"layers": out}

    def lin(prefix):
        return {"w": j(sd[prefix + ".weight"].T), "b": j(sd[prefix + ".bias"])}

    return {
        "s_lstm": {"lstm": rnn("summarizer.s_lstm.lstm", 2, True),
                   "out": lin("summarizer.s_lstm.out")},
        "e_lstm": {"lstm": rnn("summarizer.vae.e_lstm.lstm", 2, False),
                   "mu": lin("summarizer.vae.e_lstm.mu"),
                   "logvar": lin("summarizer.vae.e_lstm.logvar")},
        "d_lstm": {"lstm": rnn("summarizer.vae.d_lstm.lstm", 2, False),
                   "recons": lin("summarizer.vae.d_lstm.recons")},
        "c_lstm": {"lstm": rnn("gan.c_lstm.lstm", 2, False),
                   "out": lin("gan.c_lstm.out.0")},
    }


# ------------------------------------------------------- torch-exact pieces
def global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(tree)))


def torch_clip(tree, max_norm=5.0):
    """nn.utils.clip_grad_norm_: scale by min(1, max_norm/(norm + 1e-6)),
    applied IN PLACE to every grad (torch/nn/utils/clip_grad.py)."""
    scale = jnp.minimum(1.0, max_norm / (global_norm(tree) + 1e-6))
    return jax.tree.map(lambda x: x * scale, tree)


def bce(p, label):
    """nn.BCELoss (mean, log clamp at -100) on (B,) probs."""
    logp = jnp.maximum(jnp.log(jnp.maximum(p, 1e-38)), -100.0)
    log1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 1e-38)), -100.0)
    return -(label * logp + (1.0 - label) * log1p).mean()


def subset_adam(lr, wd, mask):
    """torch.optim.Adam over the masked subset, NO internal clipping (the
    replay applies torch's clip to the accumulated grads beforehand)."""
    inv = jax.tree.map(lambda b: not b, mask)
    inner = optax.chain(
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(eps=1e-8),
        optax.scale(-lr),
    )
    return optax.chain(
        optax.masked(inner, mask),
        optax.masked(optax.set_to_zero(), inv),
    )


def zero_subset(tree, mask):
    """optimizer.zero_grad() of the masked subset on the accumulated grads."""
    return jax.tree.map(lambda a, m: a * 0.0 if m else a, tree, mask)


def main():
    sup = "--sup" in sys.argv
    os.chdir(REPO)
    tag = "sumgan_sup" if sup else "sumgan"
    cap_path = os.path.join(REPO, "parity", f"{tag}_capture.pkl")
    if not os.path.exists(cap_path):
        print(f"[lockstep-sumgan] capturing reference trajectory -> {cap_path}",
              flush=True)
        run_capture(sup, cap_path)
    with open(cap_path, "rb") as f:
        blob = pickle.load(f)
    cap, ref = blob["cap"], blob["result"]

    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.models import sumgan as sg
    from summarizer_tpu.train.adversarial import path_mask
    from summarizer_tpu.train.loop import make_engine
    from summarizer_tpu.utils.config import HParameters

    hps = HParameters().load_from_args(
        {
            "model": "sumgan",
            "splits_files": list(SPLITS),
            "epochs": EPOCHS,
            "test_every_epochs": TEST_EVERY,
            "log_level": "error",
            "tensorboard": False,
            "seed": SEED,
            "extra_params": {**{k: str(v) for k, v in WIDTHS.items()},
                             "pretrain_vae": str(PRETRAIN),
                             **({"sup": "1"} if sup else {})},
        }
    )

    lr, wd = float(hps.lr), float(hps.weight_decay)
    epoch_noise = int(0.2 * EPOCHS)

    inits = iter(cap["inits"])
    orders = iter(cap["orders"])
    draws = cap["draws"]
    cursor = [0]

    def pop(expect_shape=None):
        a = draws[cursor[0]]
        cursor[0] += 1
        if expect_shape is not None:
            assert a.shape == expect_shape, (a.shape, expect_shape)
        return a

    # ---- injected forwards (batch 1, exact-length sequences, no padding)
    def fwd_inj(params, x, m, eps, uniform=None):
        lengths = m.sum(-1).astype(jnp.int32)
        if uniform is None:
            scores = sg.slstm_apply(params["s_lstm"], x, lengths)
        else:
            scores = uniform
        xw = x * (scores * m)[..., None]
        (mu, lv), c = sg.elstm_apply(params["e_lstm"], xw, lengths)
        h = mu + eps * jnp.exp(0.5 * lv)
        x_hat = sg.dlstm_apply(params["d_lstm"], x.shape[1], h, c, lengths)
        return x_hat, (mu, lv), scores

    def recons(h_real, h_fake):
        return jnp.sqrt(jnp.maximum(((h_real - h_fake) ** 2).sum(), 1e-24))

    def prior(mu, lv):
        return -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))

    def disc(params, x, m):
        return sg.discriminate(params, x, m)

    # ---- phase losses with injected draws
    def loss_vae(params, x, m, eps):
        lengths = m.sum(-1).astype(jnp.int32)
        (mu, lv), c = sg.elstm_apply(params["e_lstm"], x, lengths)
        h = mu + eps * jnp.exp(0.5 * lv)
        x_hat = sg.dlstm_apply(params["d_lstm"], x.shape[1], h, c, lengths)
        return recons(x, x_hat) + prior(mu, lv)

    def loss_se(params, x, y, m, eps):
        x_hat, (mu, lv), scores = fwd_inj(params, x, m, eps)
        _, h_real = disc(params, x, m)
        _, h_fake = disc(params, x_hat, m)
        if sup:
            sparsity = bce(scores.reshape(-1), y.reshape(-1))
        else:
            sparsity = jnp.abs(scores.mean() - SIGMA)
        return recons(h_real, h_fake) + prior(mu, lv) + sparsity

    def loss_d(params, x, m, eps1, u, eps2):
        x_hat, _, _ = fwd_inj(params, x, m, eps1)
        x_hat_p, _, _ = fwd_inj(params, x, m, eps2, uniform=u)
        _, h_real = disc(params, x, m)
        pf, h_fake = disc(params, x_hat, m)
        pu, _ = disc(params, x_hat_p, m)
        return (recons(h_real, h_fake)
                + bce(pf, jnp.full_like(pf, 0.9))
                + bce(pu, jnp.full_like(pu, 0.9)))

    def loss_c(params, x, m, eps1, u, eps2, n1, n2, n3, use_noise):
        x_hat, _, _ = fwd_inj(params, x, m, eps1)
        x_hat_p, _, _ = fwd_inj(params, x, m, eps2, uniform=u)
        if use_noise:  # static python bool: traced per (shape, flag)
            x = n1 * x
            x_hat = x_hat * n2
            x_hat_p = x_hat_p * n3
        pr, _ = disc(params, x, m)
        pf, _ = disc(params, x_hat, m)
        pu, _ = disc(params, x_hat_p, m)
        loss = (bce(pr, jnp.full_like(pr, 0.9))
                + bce(pf, jnp.full_like(pf, 0.1))
                + bce(pu, jnp.full_like(pu, 0.1)))
        return loss, (pr.mean(), pf.mean(), pu.mean())

    # ---- phase steps carrying the torch grad-accumulation tree
    def make_phase(loss_fn, mask, opt, has_aux=False, static_argnums=()):
        def step(params, opt_state, acc, *inputs):
            acc = zero_subset(acc, mask)  # optimizer.zero_grad()
            out, g = jax.value_and_grad(loss_fn, has_aux=has_aux)(
                params, *inputs
            )
            acc = jax.tree.map(jnp.add, acc, g)  # .backward() accumulation
            acc = torch_clip(acc)  # clip_grad_norm_(ALL params, 5.0)
            upd, opt_state = opt.update(acc, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, acc, out

        return jax.jit(step, static_argnums=static_argnums)

    t0 = time.time()
    rows, fold_rows = [], []
    for sf in hps.splits_files:
        dataset = SummarizerDataset(hps.dataset_of_file[sf])
        engine = make_engine(hps, dataset, hps.dataset_name_of_file[sf])
        splits = hps.splits_of_file[sf]
        corrs, af1s, mf1s = [], [], []
        for fold, split in enumerate(splits):
            train_keys = list(split["train_keys"])
            params = params_from_state_dict(next(inits))

            m_vae = path_mask(params, [("e_lstm",), ("d_lstm",)])
            m_se = path_mask(params, [("s_lstm",), ("e_lstm",)])
            m_d = path_mask(params, [("d_lstm",)])
            m_c = path_mask(params, [("c_lstm",)])

            opt_vae = subset_adam(lr, wd, m_vae)
            opt_se = subset_adam(lr, wd, m_se)
            opt_d = subset_adam(lr, wd, m_d)
            opt_c = subset_adam(lr, wd, m_c)

            step_vae = make_phase(loss_vae, m_vae, opt_vae)
            step_se = make_phase(loss_se, m_se, opt_se)
            step_d = make_phase(loss_d, m_d, opt_d)
            # step args: (params, opt_state, acc, x, m, eps1, u, eps2,
            #             n1, n2, n3, use_noise) -> use_noise is arg 11.
            step_c = make_phase(loss_c, m_c, opt_c, has_aux=True,
                                static_argnums=(11,))

            s_vae = opt_vae.init(params)
            acc = jax.tree.map(jnp.zeros_like, params)

            # Per-video exact-length tensors (reference reads raw h5 arrays).
            xs, ys, ms = {}, {}, {}
            for k in train_keys:
                r = dataset[k]
                x = jnp.asarray(r.features[None])  # (1, T, D)
                g = np.asarray(r.gtscore, np.float32)
                g = g - g.min()
                g = g / max(g.max(), 1e-12)
                xs[k], ys[k] = x, jnp.asarray(g[None])
                ms[k] = jnp.ones((1, x.shape[1]), jnp.float32)

            L = 2  # edLSTM_num_layers

            # ---------------- VAE pretrain (sumgan.py:320-355)
            for _ in range(PRETRAIN):
                order = next(orders)
                for k in order:
                    eps = jnp.asarray(pop())  # (L, 1, H)
                    params, s_vae, acc, _ = step_vae(
                        params, s_vae, acc, xs[k], ms[k], eps
                    )

            # ---------------- 3-phase adversarial training
            s_se = opt_se.init(params)
            s_d = opt_d.init(params)
            s_c = opt_c.init(params)
            eval_fn = engine.make_eval_fn(list(split["test_keys"]))
            k0 = jax.random.PRNGKey(0)  # eval path draws nothing

            best_corr, best_a, best_m = -1.0, 0.0, 0.0
            for epoch in range(EPOCHS):
                order = next(orders)
                use_noise = epoch < epoch_noise
                for k in order:
                    x, y, m = xs[k], ys[k], ms[k]
                    t = x.shape[1]
                    # phase 1: selector+encoder
                    eps = jnp.asarray(pop())
                    params, s_se, acc, _ = step_se(
                        params, s_se, acc, x, y, m, eps
                    )
                    # phase 2: decoder (draw order: eps, uniform, eps —
                    # sumgan.py:435-441 with rand inside the uniform branch)
                    eps1 = jnp.asarray(pop())
                    u = jnp.asarray(pop((t, 1, 1)).reshape(1, t))
                    eps2 = jnp.asarray(pop())
                    params, s_d, acc, _ = step_d(
                        params, s_d, acc, x, m, eps1, u, eps2
                    )
                    # phase 3: discriminator
                    eps1 = jnp.asarray(pop())
                    u = jnp.asarray(pop((t, 1, 1)).reshape(1, t))
                    eps2 = jnp.asarray(pop())
                    if use_noise:
                        n1 = jnp.asarray(pop((t, 1, 1024)).transpose(1, 0, 2))
                        n2 = jnp.asarray(pop((t, 1, 1024)).transpose(1, 0, 2))
                        n3 = jnp.asarray(pop((t, 1, 1024)).transpose(1, 0, 2))
                    else:
                        n1 = n2 = n3 = jnp.zeros((1, t, 1024), jnp.float32)
                    params, s_c, acc, _ = step_c(
                        params, s_c, acc, x, m, eps1, u, eps2, n1, n2, n3,
                        use_noise,
                    )
                if epoch % TEST_EVERY == 0:
                    corr, a, mx = eval_fn(params, k0)
                    best_a, best_m = max(best_a, a), max(best_m, mx)
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
            print(f"[lockstep-{tag}] {os.path.basename(sf)} fold {fold}: "
                  f"corr {best_corr:.5f} avgF1 {best_a:.5f} maxF1 {best_m:.5f}",
                  flush=True)
        rows.append(
            {"splits_file": os.path.basename(sf),
             "corr": round(float(np.mean(corrs)), 5),
             "avg_f1": round(float(np.mean(af1s)), 5),
             "max_f1": round(float(np.mean(mf1s)), 5)}
        )

    assert cursor[0] == len(draws), (
        f"draw stream mismatch: consumed {cursor[0]} of {len(draws)}"
    )

    out = {
        "stack": f"summarizer_tpu-{jax.devices()[0].platform}-lockstep",
        "name": f"{tag}-lockstep",
        "model": "sumgan",
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
