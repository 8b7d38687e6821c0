"""Lockstep parity for the Transformer encoder scorer: replay the reference
torch stack's training trajectory through the TPU engine.

Same recipe as scripts/parity_lockstep_vasnet.py, applied to the 6-layer
post-norm encoder family (summarizer/models/transformer.py:18-103) — but on
the OVERFIT splits (1 fold, 10 videos, train==test; the reference's own
"minimal working example", summarizer/utils/config.py:106-113).  The full
5-fold CV lockstep would cost ~9 h of torch-CPU + CPU-XLA wall for this
family (reference transformer-cv measured 10,208 s alone); the overfit
trajectory exercises the identical numerics — 6 encoder layers, shared
final/head LayerNorm, per-video min-max targets, MSE/Adam chain — at 1/60th
the step count.

Reference RNG stream replayed per fold: one ``Transformer()`` construction
(ONE TransformerEncoderLayer init that nn.TransformerEncoder deepcopies
x6 — all layers start identical, transformer.py:49-50 — then k1, k2), the
global-python-random per-epoch ``shuffle(train_keys)`` (transformer.py:145),
and the predict-time extra construction (main.py:65).  The reference side
runs with ``patch_no_dropout`` (parity_ref_worker.py): encoder-layer dropout
modules -> Identity, MHA functional dropout -> 0.0, head dropout ->
Identity; this side runs dropout 0 / head_dropout 0 / dense attention.

Usage: python scripts/parity_lockstep_transformer.py   # appends to results.jsonl
"""

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

SEED = 12345
EPOCHS = int(os.environ.get("LOCKSTEP_EPOCHS", "20"))  # smoke runs: set 2
TEST_EVERY = 2
SPLITS = ["splits/tvsum_splits_overfit.json", "splits/summe_splits_overfit.json"]
RESULTS = os.path.join(REPO, "parity", "results.jsonl")


def torch_rng_plan(splits_per_file, epochs):
    """Replay the reference's RNG consumption: per split file a list of
    folds, each fold = (params pytree from a real reference Transformer()
    construction, per-epoch key orders)."""
    import types

    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    if "summarizer.utils.knapsack" not in sys.modules:
        shim = types.ModuleType("summarizer.utils.knapsack")
        shim.knapsack_ortools = lambda *a, **k: []
        sys.modules["summarizer.utils.knapsack"] = shim
    from summarizer.models.transformer import Transformer  # reference init

    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)

    t = lambda x: np.asarray(x.detach().numpy())  # noqa: E731

    def conv_layer(layer):
        return {
            "attn": {
                "w_in": t(layer.self_attn.in_proj_weight).T.copy(),
                "b_in": t(layer.self_attn.in_proj_bias).copy(),
                "out": {"w": t(layer.self_attn.out_proj.weight).T.copy(),
                        "b": t(layer.self_attn.out_proj.bias).copy()},
            },
            "lin1": {"w": t(layer.linear1.weight).T.copy(),
                     "b": t(layer.linear1.bias).copy()},
            "lin2": {"w": t(layer.linear2.weight).T.copy(),
                     "b": t(layer.linear2.bias).copy()},
            "norm1": {"g": t(layer.norm1.weight).copy(),
                      "b": t(layer.norm1.bias).copy()},
            "norm2": {"g": t(layer.norm2.weight).copy(),
                      "b": t(layer.norm2.bias).copy()},
        }

    def convert(m):
        return {
            "layers": [conv_layer(la) for la in m.transformer_encoder.layers],
            "norm": {"g": t(m.layer_norm.weight).copy(),
                     "b": t(m.layer_norm.bias).copy()},
            "k1": {"w": t(m.k1.weight).T.copy(), "b": t(m.k1.bias).copy()},
            "k2": {"w": t(m.k2.weight).T.copy(), "b": t(m.k2.bias).copy()},
        }

    plan = []
    for splits in splits_per_file:
        folds = []
        for split in splits:
            params = convert(Transformer())  # _init_model defaults (:107-116)
            train_keys = split["train_keys"][:]
            orders = []
            for _ in range(epochs):
                random.shuffle(train_keys)  # transformer.py:145, python RNG
                orders.append(list(train_keys))
            folds.append((params, orders))
        Transformer()  # predict-time model.reset() (main.py:65)
        plan.append(folds)
    return plan


def main():
    os.chdir(REPO)
    from summarizer_tpu.data.batching import pack_train
    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.train.loop import make_engine
    from summarizer_tpu.train.optim import torch_adam
    from summarizer_tpu.train.supervised import make_epoch_fn
    from summarizer_tpu.utils.config import HParameters

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.devices()[0].platform == "cpu", jax.devices()

    hps = HParameters().load_from_args(
        {
            "model": "transformer",
            "splits_files": list(SPLITS),
            "epochs": EPOCHS,
            "test_every_epochs": TEST_EVERY,
            "log_level": "error",
            "tensorboard": False,
            "seed": SEED,
            # dropout 0 at both sites matches the reference Identity patch;
            # dense attention for exact-order float parity with torch BLAS.
            "extra_params": {"dropout": "0", "head_dropout": "0", "flash": "0"},
        }
    )
    splits_per_file = [hps.splits_of_file[sf] for sf in hps.splits_files]
    plan = torch_rng_plan(splits_per_file, EPOCHS)

    t0 = time.time()
    rows = []
    for sf, splits, folds_plan in zip(hps.splits_files, splits_per_file, plan):
        dataset = SummarizerDataset(hps.dataset_of_file[sf])
        engine = make_engine(hps, dataset, hps.dataset_name_of_file[sf])
        optimizer = torch_adam(float(hps.lr), float(hps.weight_decay))
        epoch_fn = make_epoch_fn(
            engine.spec.module.apply, engine.hp, optimizer, True, batch_size=1
        )
        corrs, af1s, mf1s = [], [], []
        for fold, (split, (init_params, orders)) in enumerate(
            zip(splits, folds_plan)
        ):
            train_keys = list(split["train_keys"])
            key_index = {k: i for i, k in enumerate(train_keys)}
            pack = pack_train(dataset.subset(train_keys), t_max=engine.t_max)
            feats = jax.device_put(pack.features)
            targets = jax.device_put(pack.targets)
            mask = jax.device_put(pack.mask)

            params = jax.tree.map(jnp.asarray, init_params)
            opt_state = optimizer.init(params)
            eval_fn = engine.make_eval_fn(list(split["test_keys"]))

            best_corr, best_a, best_m = -1.0, 0.0, 0.0
            k = jax.random.PRNGKey(0)  # unused: dropout 0
            for epoch in range(EPOCHS):
                perm = jnp.asarray(
                    np.array([key_index[kk] for kk in orders[epoch]], np.int32)
                )
                params, opt_state, _ = epoch_fn(
                    params, opt_state, feats, targets, mask, perm, k
                )
                if epoch % TEST_EVERY == 0:
                    corr, a, m = eval_fn(params, k)
                    best_a, best_m = max(best_a, a), max(best_m, m)
                    if corr > best_corr:
                        best_corr = corr
            corrs.append(best_corr)
            af1s.append(best_a)
            mf1s.append(best_m)
            print(
                f"[lockstep-transformer] {os.path.basename(sf)} fold {fold}: "
                f"corr {best_corr:.5f} avgF1 {best_a:.5f} maxF1 {best_m:.5f}",
                flush=True,
            )
        rows.append(
            {
                "splits_file": os.path.basename(sf),
                "corr": round(float(np.mean(corrs)), 5),
                "avg_f1": round(float(np.mean(af1s)), 5),
                "max_f1": round(float(np.mean(mf1s)), 5),
            }
        )

    out = {
        "stack": f"summarizer_tpu-{jax.devices()[0].platform}-lockstep",
        "name": "transformer-lockstep",
        "model": "transformer",
        "epochs": EPOCHS,
        "seed": SEED,
        "wall_s": round(time.time() - t0, 1),
        "results": rows,
    }
    with open(RESULTS, "a") as f:
        f.write(json.dumps(out) + "\n")
    print("PARITY_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
