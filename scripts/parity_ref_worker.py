"""Run ONE reference (torch) training config, offline, and emit a JSON result.

Executes the reference stack at /root/reference on the repo's synthetic h5
datasets + the repo's split files, so its 5-fold CV metrics are directly
comparable with the TPU stack's on identical data (VERDICT.md item 2).

OR-Tools is not installed here; ``summarizer.utils.knapsack`` is shimmed with
the repo's exact first-party DP (same ×1000 int cast semantics as
summarizer/utils/knapsack.py:12-15), so summary F1 is bit-identical in the
selection step.

Usage: python scripts/parity_ref_worker.py '<json config>'
Config keys: name, model, splits_files (list), epochs, lr, weight_decay,
test_every_epochs, extra_params, seed, workdir (scratch cwd with datasets/ +
splits/ symlinks).
"""

import json
import os
import random
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv):
    cfg = json.loads(argv[1])
    os.makedirs(cfg["workdir"], exist_ok=True)
    os.chdir(cfg["workdir"])
    for link, target in (
        ("datasets", os.path.join(REPO, "datasets")),
        ("splits", os.path.join(REPO, "splits")),
    ):
        # lexists: a dangling symlink (target regenerated later) still counts.
        if not os.path.lexists(link):
            os.symlink(target, link)
    os.makedirs("logs", exist_ok=True)

    sys.path.insert(0, REPO)
    sys.path.insert(0, "/root/reference")

    import numpy as np
    import torch

    seed = int(cfg.get("seed", 12345))
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    # --- knapsack shim (ortools-free, exact parity) -------------------------
    from summarizer_tpu.ops.knapsack import knapsack_solve

    shim = types.ModuleType("summarizer.utils.knapsack")

    def knapsack_ortools(values, weights, items, capacity):
        v = (np.asarray(values, dtype=np.float64) * 1000).astype(np.int64)
        w = np.asarray(weights).astype(np.int64)
        return knapsack_solve(v, w, int(capacity))

    shim.knapsack_ortools = knapsack_ortools
    sys.modules["summarizer.utils.knapsack"] = shim

    from summarizer.main import train
    from summarizer.utils.config import HParameters

    if cfg.get("patch_no_dropout"):
        # Lockstep mode (scripts/parity_lockstep_{vasnet,transformer}.py):
        # replace the model's nn.Dropout modules with Identity AFTER
        # construction, so the torch RNG stream consists of the per-fold
        # weight inits only (dropout's per-forward mask draws would
        # otherwise make the stream epoch-count-dependent and
        # unreplayable).  Identity (not p=0): torch's dropout still
        # advances the RNG at p=0.
        if cfg["model"] == "vasnet":
            import summarizer.models.vasnet as rv

            _orig_init_model = rv.VASNetTrainer._init_model

            def _init_model_no_dropout(self):
                model = _orig_init_model(self)
                model.dropout = torch.nn.Identity()
                return model

            rv.VASNetTrainer._init_model = _init_model_no_dropout
        elif cfg["model"] == "transformer":
            # The encoder stack has three dropout sites per layer (module
            # attrs dropout/dropout1/dropout2) plus MultiheadAttention's
            # FUNCTIONAL dropout (a float attr, applied only when > 0 —
            # F.multi_head_attention_forward guards `if dropout_p > 0`),
            # plus the 0.5 head dropout (transformer.py:46, 101).
            import summarizer.models.transformer as rt

            _orig_init_model_t = rt.TransformerTrainer._init_model

            def _init_model_no_dropout_t(self):
                model = _orig_init_model_t(self)
                model.dropout = torch.nn.Identity()
                for layer in model.transformer_encoder.layers:
                    layer.dropout = torch.nn.Identity()
                    layer.dropout1 = torch.nn.Identity()
                    layer.dropout2 = torch.nn.Identity()
                    layer.self_attn.dropout = 0.0
                return model

            rt.TransformerTrainer._init_model = _init_model_no_dropout_t
        else:
            raise ValueError(f"patch_no_dropout: unsupported {cfg['model']}")

    cap = None
    if cfg.get("capture_sumgan"):
        # Lockstep capture mode (scripts/parity_lockstep_sumgan.py): record
        # the reference SumGAN trainer's complete stochastic trajectory —
        # per-fold initial weights, every shuffle order (pretrain AND train
        # epochs, in call order), and every torch RNG tensor draw in call
        # order: the VAE reparameterization eps (sumgan.py:134
        # torch.randn_like), the uniform-score branch (sumgan.py:177
        # torch.rand), and the discriminator input noise (sumgan.py:466-468
        # torch.randn_like).  The replay side injects these exact tensors,
        # so any residual metric delta is pure float accumulation.
        import summarizer.models.sumgan as rs

        cap = {"inits": [], "orders": [], "draws": []}

        _orig_randn_like = torch.randn_like
        _orig_rand = torch.rand

        def rec_randn_like(t, *a, **kw):
            out = _orig_randn_like(t, *a, **kw)
            cap["draws"].append(out.detach().cpu().numpy().copy())
            return out

        def rec_rand(*a, **kw):
            out = _orig_rand(*a, **kw)
            cap["draws"].append(out.detach().cpu().numpy().copy())
            return out

        # sumgan.py calls these as attributes of its imported ``torch``
        # module; patch the global torch namespace (nothing else draws via
        # torch.rand/randn_like during a sumgan run — LSTM/Linear inits use
        # in-place uniform_, and eval/predict are draw-free selectors).
        torch.randn_like = rec_randn_like
        torch.rand = rec_rand

        class RecordingRandomS:
            def __getattr__(self_, name):
                return getattr(random, name)

            def shuffle(self_, lst):
                random.shuffle(lst)
                cap["orders"].append(list(lst))

        rs.random = RecordingRandomS()

        _orig_init_model_s = rs.SumGANTrainer._init_model

        def _recording_init_model_s(self_):
            model = _orig_init_model_s(self_)
            cap["inits"].append(
                {k: v.detach().cpu().numpy().copy()
                 for k, v in model.state_dict().items()}
            )
            return model

        rs.SumGANTrainer._init_model = _recording_init_model_s

    if cfg.get("capture_sumgan_att"):
        # SumGAN-att lockstep capture (scripts/parity_lockstep_sumgan_att.py):
        # the AE is deterministic (no VAE), so the only tensor draws are the
        # uniform-score branch (sumgan_att.py:113 torch.rand) and the
        # discriminator input noise (sumgan_att.py:342-344 randn_like).
        # Dropout in the selector/AE transformer layers is swapped for
        # Identity (and MHA functional dropout zeroed) so the torch RNG
        # stream is draw-free outside the captured sites.
        import summarizer.models.sumgan_att as ra

        cap = {"inits": [], "orders": [], "draws": []}

        _orig_randn_like_a = torch.randn_like
        _orig_rand_a = torch.rand

        def rec_randn_like_a(t, *a, **kw):
            out = _orig_randn_like_a(t, *a, **kw)
            cap["draws"].append(out.detach().cpu().numpy().copy())
            return out

        def rec_rand_a(*a, **kw):
            out = _orig_rand_a(*a, **kw)
            cap["draws"].append(out.detach().cpu().numpy().copy())
            return out

        torch.randn_like = rec_randn_like_a
        torch.rand = rec_rand_a

        class RecordingRandomA:
            def __getattr__(self_, name):
                return getattr(random, name)

            def shuffle(self_, lst):
                random.shuffle(lst)
                cap["orders"].append(list(lst))

        ra.random = RecordingRandomA()

        def _strip_dropout(layer):
            for attr in ("dropout", "dropout1", "dropout2", "dropout3"):
                if hasattr(layer, attr):
                    setattr(layer, attr, torch.nn.Identity())
            for attr in ("self_attn", "multihead_attn"):
                if hasattr(layer, attr):
                    getattr(layer, attr).dropout = 0.0

        _orig_init_model_a = ra.SumGANAttTrainer._init_model

        def _recording_init_model_a(self_):
            model = _orig_init_model_a(self_)
            for layer in model.summarizer.selector.transformer_encoder.layers:
                _strip_dropout(layer)
            for layer in model.summarizer.ae.transformer_encoder.layers:
                _strip_dropout(layer)
            for layer in model.summarizer.ae.transformer_decoder.layers:
                _strip_dropout(layer)
            cap["inits"].append(
                {k: v.detach().cpu().numpy().copy()
                 for k, v in model.state_dict().items()}
            )
            return model

        ra.SumGANAttTrainer._init_model = _recording_init_model_a

    if cfg.get("capture_dsn"):
        # Lockstep capture mode (scripts/parity_lockstep_dsn.py): record the
        # reference DSN trainer's complete stochastic trajectory — per-fold
        # initial weights (state_dict), per-epoch shuffled key orders
        # (dsn.py:93 random.shuffle), and every Bernoulli episode's sampled
        # actions (dsn.py:126) — so the TPU engine can replay the SAME
        # trajectory with no RNG replication at all.
        import summarizer.models.dsn as rd

        cap = {"inits": [], "orders": [], "actions": []}

        class RecordingBernoulli(torch.distributions.Bernoulli):
            def sample(self_, *a, **kw):
                actions = super().sample(*a, **kw)
                cap["actions"].append(
                    actions.detach().cpu().numpy().reshape(-1).astype(np.uint8)
                )
                return actions

        rd.Bernoulli = RecordingBernoulli

        class RecordingRandom:
            """dsn.py's ``random`` namespace with a shuffle that records the
            resulting order (everything else passes through)."""

            def __getattr__(self_, name):
                return getattr(random, name)

            def shuffle(self_, lst):
                random.shuffle(lst)
                cap["orders"].append(list(lst))

        rd.random = RecordingRandom()

        _orig_init_model = rd.DSNTrainer._init_model

        def _recording_init_model(self_):
            model = _orig_init_model(self_)
            cap["inits"].append(
                {k: v.detach().cpu().numpy().copy()
                 for k, v in model.state_dict().items()}
            )
            return model

        rd.DSNTrainer._init_model = _recording_init_model

    hps_init = {
        "model": cfg["model"],
        "splits_files": list(cfg["splits_files"]),
        "epochs": cfg.get("epochs"),
        "lr": cfg.get("lr"),
        "weight_decay": cfg.get("weight_decay"),
        "test_every_epochs": cfg.get("test_every_epochs"),
        "use_cuda": "no",
        "log_level": cfg.get("log_level", "error"),
        "extra_params": cfg.get("extra_params", {}),
    }
    hps = HParameters()
    hps.load_from_args(hps_init)

    t0 = time.time()
    results = train(hps)
    wall = time.time() - t0

    out = {
        "stack": "reference-torch-cpu",
        "name": cfg["name"],
        "model": cfg["model"],
        "epochs": cfg.get("epochs"),
        "seed": seed,
        "wall_s": round(wall, 1),
        "results": [
            {
                "splits_file": os.path.basename(sf),
                "corr": round(float(c), 5),
                "avg_f1": round(float(a), 5),
                "max_f1": round(float(m), 5),
            }
            for sf, c, a, m in results
        ],
    }
    if cap is not None:
        import pickle

        cap_path = (cfg.get("capture_dsn") or cfg.get("capture_sumgan")
                    or cfg.get("capture_sumgan_att"))
        with open(cap_path, "wb") as f:
            pickle.dump(
                {"cap": cap, "cfg": cfg, "result": out},
                f, protocol=pickle.HIGHEST_PROTOCOL,
            )
        counts = " ".join(
            f"{k}={len(v)}" for k, v in cap.items() if isinstance(v, list)
        )
        print(f"CAPTURE {cap_path} {counts}", flush=True)

    print("PARITY_RESULT " + json.dumps(out), flush=True)
    hps.writer.close()


if __name__ == "__main__":
    main(sys.argv)
