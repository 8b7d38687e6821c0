"""Lockstep parity for SumGAN-att (WGAN, transformer selector + AE).

Capture-replay like scripts/parity_lockstep_sumgan.py, with a simpler draw
stream — the AE is deterministic (no VAE eps), so the only torch draws are
the uniform-score branch (summarizer/models/sumgan_att.py:113) and the
discriminator input noise (:342-344).  Dropout in the selector/AE
transformer layers is stripped on the reference side (Identity modules +
zeroed MHA functional dropout) and ours runs train=False; the replay
reproduces the reference's cross-phase stale-grad clip accumulation
(QUIRKS.md #11) exactly, plus its Wasserstein losses (:187-193), AE
pretrain at lr*10 (:195-230), and ``sup`` defaulting True (:155).

Reference optimizer quirk reproduced implicitly: the reference passes the
deepcopy PROTOTYPE encoder/decoder layer's params to the Adam groups
(sumgan_att.py:242-250) — those modules never appear in the forward pass,
get no grads, and torch's Adam/clip skip None-grad params, so they are
inert; the replay simply omits them.

Usage: python scripts/parity_lockstep_sumgan_att.py   # capture + replay
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
PRETRAIN = 4
TEST_EVERY = 1
SPLITS = ["splits/summe_splits_overfit_small.json"]
EXTRA = {"s_encoder_layers": 1, "ae_encoder_layers": 1,
         "cLSTM_hidden_size": 128}
HEADS = 4  # s_attention_heads == ae_attention_heads default
RESULTS = os.path.join(REPO, "parity", "results.jsonl")


def run_capture(cap_path: str) -> None:
    cfg = {
        "name": "sumgan_att-lockstep-ref",
        "model": "sumgan_att",
        "splits_files": list(SPLITS),
        "epochs": EPOCHS,
        "test_every_epochs": TEST_EVERY,
        "seed": SEED,
        "workdir": os.path.join(REPO, "parity", "work_sumgan"),
        "capture_sumgan_att": cap_path,
        "log_level": "info",
        "extra_params": {**EXTRA, "pretrain_ae": PRETRAIN},
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


def params_from_state_dict(sd, n_s, n_ae):
    j = lambda a: jnp.asarray(np.asarray(a))  # noqa: E731

    def mha(prefix):
        return {
            "w_in": j(sd[f"{prefix}.in_proj_weight"].T),
            "b_in": j(sd[f"{prefix}.in_proj_bias"]),
            "out": {"w": j(sd[f"{prefix}.out_proj.weight"].T),
                    "b": j(sd[f"{prefix}.out_proj.bias"])},
        }

    def lin(prefix):
        return {"w": j(sd[prefix + ".weight"].T), "b": j(sd[prefix + ".bias"])}

    def norm(prefix):
        return {"g": j(sd[prefix + ".weight"]), "b": j(sd[prefix + ".bias"])}

    def enc_layer(prefix):
        return {
            "attn": mha(prefix + ".self_attn"),
            "lin1": lin(prefix + ".linear1"),
            "lin2": lin(prefix + ".linear2"),
            "norm1": norm(prefix + ".norm1"),
            "norm2": norm(prefix + ".norm2"),
        }

    def dec_layer(prefix):
        return {
            "self_attn": mha(prefix + ".self_attn"),
            "cross_attn": mha(prefix + ".multihead_attn"),
            "lin1": lin(prefix + ".linear1"),
            "lin2": lin(prefix + ".linear2"),
            "norm1": norm(prefix + ".norm1"),
            "norm2": norm(prefix + ".norm2"),
            "norm3": norm(prefix + ".norm3"),
        }

    def rnn(prefix, layers):
        out = []
        for layer in range(layers):
            out.append({"fwd": {
                "w_ih": j(sd[f"{prefix}.weight_ih_l{layer}"].T),
                "w_hh": j(sd[f"{prefix}.weight_hh_l{layer}"].T),
                "b_ih": j(sd[f"{prefix}.bias_ih_l{layer}"]),
                "b_hh": j(sd[f"{prefix}.bias_hh_l{layer}"]),
            }})
        return {"layers": out}

    sel = "summarizer.selector"
    return {
        "selector": {
            "layers": [enc_layer(f"{sel}.transformer_encoder.layers.{i}")
                       for i in range(n_s)],
            "norm": norm(f"{sel}.layer_norm"),
            "out": lin(f"{sel}.out.0"),
        },
        "ae": {
            "enc": [enc_layer(f"summarizer.ae.transformer_encoder.layers.{i}")
                    for i in range(n_ae)],
            "dec": [dec_layer(f"summarizer.ae.transformer_decoder.layers.{i}")
                    for i in range(n_ae)],
        },
        "c_lstm": {"lstm": rnn("gan.c_lstm.lstm", 2),
                   "out": lin("gan.c_lstm.out.0")},
    }


def global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(tree)))


def torch_clip(tree, max_norm=5.0):
    scale = jnp.minimum(1.0, max_norm / (global_norm(tree) + 1e-6))
    return jax.tree.map(lambda x: x * scale, tree)


def bce(p, label):
    logp = jnp.maximum(jnp.log(jnp.maximum(p, 1e-38)), -100.0)
    log1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 1e-38)), -100.0)
    return -(label * logp + (1.0 - label) * log1p).mean()


def subset_adam(lr, wd, mask):
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
    return jax.tree.map(lambda a, m: a * 0.0 if m else a, tree, mask)


def main():
    os.chdir(REPO)
    tag = "sumgan_att"
    cap_path = os.path.join(REPO, "parity", f"{tag}_capture.pkl")
    if not os.path.exists(cap_path):
        print(f"[lockstep-{tag}] capturing reference trajectory -> {cap_path}",
              flush=True)
        run_capture(cap_path)
    with open(cap_path, "rb") as f:
        blob = pickle.load(f)
    cap, ref = blob["cap"], blob["result"]

    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.models import sumgan_att as sga
    from summarizer_tpu.train.adversarial import path_mask
    from summarizer_tpu.train.loop import make_engine
    from summarizer_tpu.utils.config import HParameters

    hps = HParameters().load_from_args(
        {
            "model": "sumgan_att",
            "splits_files": list(SPLITS),
            "epochs": EPOCHS,
            "test_every_epochs": TEST_EVERY,
            "log_level": "error",
            "tensorboard": False,
            "seed": SEED,
            "extra_params": {**{k: str(v) for k, v in EXTRA.items()},
                             "pretrain_ae": str(PRETRAIN)},
        }
    )

    lr, wd = float(hps.lr), float(hps.weight_decay)
    epoch_noise = int(0.2 * EPOCHS)
    k0 = jax.random.PRNGKey(0)  # train=False paths draw nothing

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

    def fwd_inj(params, x, m, uniform=None):
        if uniform is None:
            scores = sga.selector_apply(params["selector"], x, m, HEADS, k0,
                                        False)
        else:
            scores = uniform
        xw = x * (scores * m)[..., None]
        x_hat = sga.ae_apply(params["ae"], xw, m, HEADS, k0, False)
        return x_hat, scores

    def recons(h_real, h_fake):
        return jnp.sqrt(jnp.maximum(((h_real - h_fake) ** 2).sum(), 1e-24))

    def disc(params, x, m):
        return sga.discriminate(params, x, m)

    def loss_ae(params, x, m):
        x_hat = sga.ae_apply(params["ae"], x, m, HEADS, k0, False)
        return recons(x, x_hat)

    def loss_se(params, x, y, m):
        x_hat, scores = fwd_inj(params, x, m)
        _, h_real = disc(params, x, m)
        _, h_fake = disc(params, x_hat, m)
        # sup defaults True (sumgan_att.py:155)
        return recons(h_real, h_fake) + bce(scores.reshape(-1), y.reshape(-1))

    def loss_d(params, x, m, u):
        x_hat, _ = fwd_inj(params, x, m)
        x_hat_p, _ = fwd_inj(params, x, m, uniform=u)
        _, h_real = disc(params, x, m)
        pf, h_fake = disc(params, x_hat, m)
        pu, _ = disc(params, x_hat_p, m)
        # WGAN generator (sumgan_att.py:187-189)
        return recons(h_real, h_fake) + jnp.mean(-0.5 * (pf + pu))

    def loss_c(params, x, m, u, n1, n2, n3, use_noise):
        x_hat, _ = fwd_inj(params, x, m)
        x_hat_p, _ = fwd_inj(params, x, m, uniform=u)
        if use_noise:
            x = n1 * x
            x_hat = x_hat * n2
            x_hat_p = x_hat_p * n3
        pr, _ = disc(params, x, m)
        pf, _ = disc(params, x_hat, m)
        pu, _ = disc(params, x_hat_p, m)
        # WGAN discriminator (sumgan_att.py:191-193)
        return jnp.mean(-pr + 0.5 * (pf + pu)), (pr.mean(), pf.mean(), pu.mean())

    def make_phase(loss_fn, mask, opt, has_aux=False, static_argnums=()):
        def step(params, opt_state, acc, *inputs):
            acc = zero_subset(acc, mask)
            out, g = jax.value_and_grad(loss_fn, has_aux=has_aux)(
                params, *inputs
            )
            acc = jax.tree.map(jnp.add, acc, g)
            acc = torch_clip(acc)
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
            params = params_from_state_dict(
                next(inits), EXTRA["s_encoder_layers"],
                EXTRA["ae_encoder_layers"],
            )

            m_ae = path_mask(params, [("ae",)])
            m_se = path_mask(params, [("selector",), ("ae", "enc")])
            m_d = path_mask(params, [("ae", "dec")])
            m_c = path_mask(params, [("c_lstm",)])

            opt_ae = subset_adam(lr * 10.0, wd, m_ae)  # sumgan_att.py:198-201
            opt_se = subset_adam(lr, wd, m_se)
            opt_d = subset_adam(lr, wd, m_d)
            opt_c = subset_adam(lr, wd, m_c)

            step_ae = make_phase(loss_ae, m_ae, opt_ae)
            step_se = make_phase(loss_se, m_se, opt_se)
            step_d = make_phase(loss_d, m_d, opt_d)
            # args: (params, opt_state, acc, x, m, u, n1, n2, n3, use_noise)
            step_c = make_phase(loss_c, m_c, opt_c, has_aux=True,
                                static_argnums=(9,))

            s_ae = opt_ae.init(params)
            acc = jax.tree.map(jnp.zeros_like, params)

            xs, ys, ms = {}, {}, {}
            for k in train_keys:
                r = dataset[k]
                x = jnp.asarray(r.features[None])
                g = np.asarray(r.gtscore, np.float32)
                g = g - g.min()
                g = g / max(g.max(), 1e-12)
                xs[k], ys[k] = x, jnp.asarray(g[None])
                ms[k] = jnp.ones((1, x.shape[1]), jnp.float32)

            # ---------------- AE pretrain at lr*10 (sumgan_att.py:195-230)
            for _ in range(PRETRAIN):
                order = next(orders)
                for k in order:
                    params, s_ae, acc, _ = step_ae(
                        params, s_ae, acc, xs[k], ms[k]
                    )

            s_se = opt_se.init(params)
            s_d = opt_d.init(params)
            s_c = opt_c.init(params)
            eval_fn = engine.make_eval_fn(list(split["test_keys"]))

            best_corr, best_a, best_m = -1.0, 0.0, 0.0
            for epoch in range(EPOCHS):
                order = next(orders)
                use_noise = epoch < epoch_noise
                for k in order:
                    x, y, m = xs[k], ys[k], ms[k]
                    t = x.shape[1]
                    # phase 1: selector + AE encoder (no draws)
                    params, s_se, acc, _ = step_se(params, s_se, acc, x, y, m)
                    # phase 2: AE decoder (one uniform draw)
                    u = jnp.asarray(pop((t, 1, 1)).reshape(1, t))
                    params, s_d, acc, _ = step_d(params, s_d, acc, x, m, u)
                    # phase 3: discriminator (uniform + optional noise)
                    u = jnp.asarray(pop((t, 1, 1)).reshape(1, t))
                    if use_noise:
                        n1 = jnp.asarray(pop((t, 1, 1024)).transpose(1, 0, 2))
                        n2 = jnp.asarray(pop((t, 1, 1024)).transpose(1, 0, 2))
                        n3 = jnp.asarray(pop((t, 1, 1024)).transpose(1, 0, 2))
                    else:
                        n1 = n2 = n3 = jnp.zeros((1, t, 1024), jnp.float32)
                    params, s_c, acc, _ = step_c(
                        params, s_c, acc, x, m, u, n1, n2, n3, use_noise
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
        "model": "sumgan_att",
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
