"""Lockstep parity for the FLAGSHIP model: replay the reference torch
stack's VASNet training trajectory through the TPU engine.

Extends scripts/parity_lockstep.py (logistic) to the attention scorer.  The
reference side is run by parity_ref_worker.py with ``patch_no_dropout``:
its nn.Dropout is swapped for Identity AFTER construction so the torch RNG
stream consists of the per-fold weight inits only (dropout's per-forward
mask draws are epoch-count-dependent and unreplayable).  This side replays
that stream — per fold, one reference ``VASNet()`` construction (6 xavier
draws, summarizer/models/vasnet.py:82-88) converted torch->pytree, plus the
global-python-random per-epoch ``shuffle(train_keys)``
(vasnet.py:190) and the predict-time extra reset (main.py:65) — and runs
the TPU engine's compiled per-video MSE/Adam chain with dropout 0.

With RNG equalized, any residual delta vs the reference's
``vasnet-lockstep`` row is pure float accumulation (XLA matmul order vs
torch BLAS) chained over epochs x videos Adam steps through softmax
attention — i.e. the strongest offline evidence that the two stacks are
numerically interchangeable on the flagship architecture (VERDICT item 2).

Runs on CPU jax (JAX_PLATFORMS=cpu self-bootstrap) so it neither contends
with nor depends on the flaky tunneled TPU worker; the engine code path is
the same XLA program.

Usage: python scripts/parity_lockstep_vasnet.py   # appends to results.jsonl
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

# The image's sitecustomize force-registers the TPU PJRT plugin at startup,
# so env vars alone cannot win (tests/conftest.py:9-25); pin the platform
# through jax.config before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

SEED = 12345
EPOCHS = 20
TEST_EVERY = 2
SPLITS = ["splits/tvsum_splits.json", "splits/summe_splits.json"]
RESULTS = os.path.join(REPO, "parity", "results.jsonl")


def torch_rng_plan(splits_per_file, epochs):
    """Replay the reference's RNG consumption: per split file a list of
    folds, each fold = (params pytree from a real reference VASNet()
    construction, per-epoch key orders)."""
    import types

    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    # summarizer.models imports the eval stack, which imports ortools (not
    # installed); shim it — only VASNet's constructor is used here.
    if "summarizer.utils.knapsack" not in sys.modules:
        shim = types.ModuleType("summarizer.utils.knapsack")
        shim.knapsack_ortools = lambda *a, **k: []
        sys.modules["summarizer.utils.knapsack"] = shim
    from summarizer.models.vasnet import VASNet  # the reference's own init

    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)

    def convert(m):
        t = lambda x: np.asarray(x.detach().numpy())  # noqa: E731
        return {
            "K": {"w": t(m.K.weight).T.copy()},
            "Q": {"w": t(m.Q.weight).T.copy()},
            "V": {"w": t(m.V.weight).T.copy()},
            "out": {"w": t(m.attention_head_projection.weight).T.copy()},
            "k1": {"w": t(m.k1.weight).T.copy(), "b": t(m.k1.bias).copy()},
            "k2": {"w": t(m.k2.weight).T.copy(), "b": t(m.k2.bias).copy()},
            "norm": {"g": t(m.layer_norm.weight).copy(),
                     "b": t(m.layer_norm.bias).copy()},
        }

    plan = []
    for splits in splits_per_file:
        folds = []
        for split in splits:
            params = convert(VASNet())  # _init_model defaults (vasnet.py:152-161)
            train_keys = split["train_keys"][:]
            orders = []
            for _ in range(epochs):
                random.shuffle(train_keys)  # vasnet.py:190, global python RNG
                orders.append(list(train_keys))
            folds.append((params, orders))
        VASNet()  # predict-time model.reset() (main.py:65)
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
            "model": "vasnet",
            "splits_files": list(SPLITS),
            "epochs": EPOCHS,
            "test_every_epochs": TEST_EVERY,
            "log_level": "error",
            "tensorboard": False,
            "seed": SEED,
            # dropout 0 matches the reference side's Identity patch; dense
            # attention (flash=0) — the Pallas interpreter path on CPU is
            # orders slower and numerically identical under dropout 0.
            "extra_params": {"dropout": "0", "flash": "0"},
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
                f"[lockstep-vasnet] {os.path.basename(sf)} fold {fold}: "
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
        "name": "vasnet-lockstep",
        "model": "vasnet",
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
