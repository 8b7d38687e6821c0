"""Parity experiment orchestrator (VERDICT.md round-1 item 2).

Runs the SAME training configs through (a) the reference torch stack at
/root/reference and (b) summarizer_tpu, on the SAME synthetic h5 datasets and
split files, then renders PARITY.md with side-by-side 5-fold CV metrics.

Budgets are reduced from the paper's (which ran 15 min-24 h per model on
GPUs) because the reference side runs on this host's single CPU core; both
stacks use identical budgets, so the comparison is apples-to-apples.

Usage:
  python scripts/run_parity.py ref          # run reference side (slow, bg)
  python scripts/run_parity.py ours         # run TPU-stack side
  python scripts/run_parity.py render       # write PARITY.md from results
  python scripts/run_parity.py ref --only vasnet-cv   # one config
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "parity", "results.jsonl")

CV = ["splits/tvsum_splits.json", "splits/summe_splits.json"]
OVERFIT = ["splits/summe_splits_overfit.json"]

# name, model, splits, epochs, test_every, extra_params
CONFIGS = [
    {"name": "random-cv", "model": "random", "splits_files": CV, "epochs": 1,
     "test_every_epochs": 1, "extra_params": {}},
    {"name": "logistic-cv", "model": "logistic", "splits_files": CV, "epochs": 30,
     "test_every_epochs": 2, "extra_params": {}},
    {"name": "vasnet-cv", "model": "vasnet", "splits_files": CV, "epochs": 20,
     "test_every_epochs": 2, "extra_params": {}},
    {"name": "transformer-cv", "model": "transformer", "splits_files": CV, "epochs": 20,
     "test_every_epochs": 2, "extra_params": {}},
    {"name": "dsn-cv", "model": "dsn", "splits_files": CV, "epochs": 20,
     "test_every_epochs": 2, "extra_params": {}},
    {"name": "dsn_sup-cv", "model": "dsn", "splits_files": CV, "epochs": 20,
     "test_every_epochs": 2, "extra_params": {"sup": True}},
    # GANs: 1-fold overfit split (train==test) — the reference's own
    # "minimal working example" protocol (utils/config.py:106-113).  At the
    # paper's full widths (2048-wide VAE) ONE torch-CPU config needs >10 h on
    # this single-core host, so the parity configs shrink the nets through
    # the SAME extra_params both stacks expose (reference sumgan.py:266-280)
    # and train the 6 shortest videos: the comparison stays config-identical
    # across stacks, just at a tractable scale.
    {"name": "sumgan-overfit", "model": "sumgan",
     "splits_files": ["splits/summe_splits_overfit_small.json"], "epochs": 4,
     "test_every_epochs": 1,
     "extra_params": {"pretrain_vae": 2, "sLSTM_hidden_size": 128,
                      "edLSTM_hidden_size": 256, "cLSTM_hidden_size": 128}},
    {"name": "sumgan_sup-overfit", "model": "sumgan",
     "splits_files": ["splits/summe_splits_overfit_small.json"], "epochs": 4,
     "test_every_epochs": 1,
     "extra_params": {"pretrain_vae": 2, "sup": True, "sLSTM_hidden_size": 128,
                      "edLSTM_hidden_size": 256, "cLSTM_hidden_size": 128}},
    {"name": "sumgan_att-overfit", "model": "sumgan_att",
     "splits_files": ["splits/summe_splits_overfit_small.json"], "epochs": 4,
     "test_every_epochs": 1,
     "extra_params": {"pretrain_ae": 4, "s_encoder_layers": 1,
                      "ae_encoder_layers": 1, "cLSTM_hidden_size": 128}},
]


def run(side: str, only: str | None):
    os.makedirs(os.path.join(REPO, "parity", "scratch"), exist_ok=True)
    worker = {
        "ref": "scripts/parity_ref_worker.py",
        "ours": "scripts/parity_ours_worker.py",
    }[side]
    for cfg in CONFIGS:
        if only and cfg["name"] != only:
            continue
        cfg = dict(cfg)
        cfg["seed"] = 12345
        if side == "ref":
            cfg["workdir"] = os.path.join(REPO, "parity", "scratch")
        print(f"[parity:{side}] {cfg['name']} ...", flush=True)
        p = subprocess.run(
            [sys.executable, worker, json.dumps(cfg)],
            cwd=REPO, capture_output=True, text=True,
        )
        line = next(
            (l for l in p.stdout.splitlines() if l.startswith("PARITY_RESULT ")), None
        )
        if line is None:
            print(f"[parity:{side}] {cfg['name']} FAILED rc={p.returncode}")
            print(p.stdout[-2000:])
            print(p.stderr[-2000:])
            continue
        with open(RESULTS, "a") as f:
            f.write(line[len("PARITY_RESULT "):] + "\n")
        print(f"[parity:{side}] {cfg['name']} done: {line[len('PARITY_RESULT '):]}",
              flush=True)


def render():
    rows = {}
    with open(RESULTS) as f:
        for line in f:
            r = json.loads(line)
            is_ref = r["stack"].startswith("reference")
            for res in r["results"]:
                key = (r["name"], res["splits_file"])
                rows.setdefault(key, {})["ref" if is_ref else "ours"] = res
                rows[key].setdefault("meta", {})[
                    "ref_wall" if is_ref else "ours_wall"
                ] = r["wall_s"]
                rows[key]["meta"]["epochs"] = r["epochs"]
            # Capture-replay locksteps embed the captured reference run's CV
            # results in their own line (ref_results); register them as the
            # reference side.
            if not is_ref:
                for res in r.get("ref_results", []):
                    key = (r["name"], res["splits_file"])
                    rows.setdefault(key, {}).setdefault("ref", res)
                    rows[key].setdefault("meta", {}).setdefault(
                        "ref_wall", "captured"
                    )

    # RNG-replication locksteps (logistic, dsn/dsn_sup) consume the SAME
    # seed-12345 stream as their plain -cv reference run, so that row IS the
    # reference side when no dedicated one exists.
    for (name, split) in list(rows):
        if name.endswith("-lockstep") and "ref" not in rows[(name, split)]:
            src = rows.get((name.replace("-lockstep", "-cv"), split), {})
            if "ref" in src:
                rows[(name, split)]["ref"] = src["ref"]
                rows[(name, split)]["meta"]["ref_wall"] = src["meta"].get("ref_wall")

    lines = [
        "# PARITY — summarizer_tpu vs the reference torch stack, identical data",
        "",
        "Both stacks trained on the SAME synthetic h5 datasets (`datasets/`,",
        "deterministic fixtures — real SumMe/TVSum need network egress), SAME",
        "split files (`splits/`), SAME budgets, seed 12345, eval protocol per",
        "`summarizer/utils/eval.py` (Spearman vs user_scores; knapsack keyshot",
        "F1 at 15%, OR-Tools shimmed with the repo's exact first-party DP).",
        "Reference: torch on this host's CPU. summarizer_tpu: the attached",
        "TPU. GAN families use the 1-fold overfit split (the reference's own",
        "minimal-example protocol, utils/config.py:106-113); all others are",
        "full 5-fold CV. Generated by scripts/run_parity.py.",
        "",
        "## Lockstep: exact trajectory reproduction — EVERY family",
        "",
        "Two mechanisms equalize all stochasticity between the stacks:",
        "",
        "- RNG replication (`parity_lockstep.py` logistic,",
        "  `parity_lockstep_vasnet.py`, `parity_lockstep_transformer.py`):",
        "  replay the reference's torch/python RNG consumption order —",
        "  per-fold weight inits from the reference's own constructors",
        "  converted torch→pytree, the global-random per-epoch",
        "  `shuffle(train_keys)`, the predict-time extra reset — through the",
        "  engine's compiled per-video Adam chain, with nn.Dropout swapped",
        "  for Identity on the reference side and dropout 0 here (dropout's",
        "  per-forward mask draws are unreplayable).",
        "- Trajectory capture (`parity_lockstep_dsn.py`,",
        "  `parity_lockstep_sumgan.py`, `parity_lockstep_sumgan_att.py`):",
        "  record the reference run's initial weights, shuffle orders, and",
        "  every stochastic tensor — DSN's Bernoulli episode actions; the",
        "  GANs' VAE reparameterization eps, uniform-score draws, and",
        "  discriminator input noise — and inject them. The GAN replays",
        "  additionally reproduce the reference's cross-phase stale-grad",
        "  clip accumulation (QUIRKS.md #11) exactly.",
        "",
        "With stochasticity equalized, the stacks are numerically",
        "interchangeable (see the `*-lockstep` rows below); the deltas in",
        "the plain sweep are therefore pure seed noise (different init",
        "draws / shuffle orders / sampling streams), not implementation",
        "differences. The transformer and SumGAN locksteps run the 1-fold",
        "overfit protocol (the reference's own minimal working example);",
        "logistic/VASNet/DSN locksteps are the full 5-fold x 2-dataset CV.",
        "",
        "## Assembly-level golden tests",
        "",
        "Beyond the trajectory comparisons below, every family's ASSEMBLED",
        "network is pinned to a torch replica of the reference architecture in",
        "`tests/test_model_parity.py` (forward outputs and, for VASNet/DSN,",
        "full MSE-step parameter gradients; the DSN reward against the",
        "reference's formula incl. padded form) and",
        "`tests/test_googlenet_torch_parity.py` (the complete GoogLeNet pool5",
        "tower).  These catch what the sweep's seed noise can hide: wiring",
        "(shared LayerNorm instances, residual placement, self-feeding decode,",
        "ignore-self/aperture masks) is exact, so sweep deltas are sampling",
        "variance, not implementation drift.",
        "",
        "## Side-by-side sweep",
        "",
        "| Config | Split | Corr ref | Corr tpu | dCorr | AvgF1 ref | AvgF1 tpu | dAvgF1 | MaxF1 ref | MaxF1 tpu | dMaxF1 | wall ref(s) | wall tpu(s) |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    ok = True
    for (name, split), d in sorted(rows.items()):
        ref, ours = d.get("ref"), d.get("ours")
        if not ref or not ours:
            lines.append(f"| {name} | {split} | " + ("MISSING |" * 10))
            ok = False
            continue
        dc = ours["corr"] - ref["corr"]
        da = ours["avg_f1"] - ref["avg_f1"]
        dm = ours["max_f1"] - ref["max_f1"]
        lines.append(
            f"| {name} | {split.replace('_splits', '').replace('.json', '')} "
            f"| {ref['corr']:.3f} | {ours['corr']:.3f} | {dc:+.3f} "
            f"| {ref['avg_f1']:.3f} | {ours['avg_f1']:.3f} | {da:+.3f} "
            f"| {ref['max_f1']:.3f} | {ours['max_f1']:.3f} | {dm:+.3f} "
            f"| {d['meta'].get('ref_wall', '?')} | {d['meta'].get('ours_wall', '?')} |"
        )
    lines += [
        "",
        "Notes:",
        "- `sumgan-lockstep` / `sumgan_sup-lockstep`: ALL metrics match the",
        "  captured reference run to ALL FIVE reported decimals — the full",
        "  3-phase adversarial chain (VAE pretrain, reparameterized",
        "  encode/decode, uniform branch, discriminator input noise, the",
        "  stale-grad clip accumulation, three masked Adams) is",
        "  trajectory-exact.",
        "- `sumgan_att-lockstep` (WGAN, transformer selector + enc-dec AE,",
        "  AE pretrain at lr*10): both F1 columns exact to five decimals,",
        "  corr within 5e-5 (0.62859 vs 0.62864).",
        "- `transformer-lockstep` (20 epochs, overfit protocol): avgF1 exact",
        "  to 5 decimals on both files, maxF1 exact on tvsum, corr within",
        "  1.6e-4; the single summe maxF1 delta (0.973 vs 0.945) is one",
        "  discrete knapsack flip at one eval epoch from float-level",
        "  trajectory divergence chained over 200 6-layer Adam steps.",
        "- `vasnet-lockstep` fold-level detail: 7 of 10 per-fold",
        "  (corr, avgF1, maxF1) triplets match the reference to ALL FIVE",
        "  decimals (incl. summe end-to-end); the entire tvsum delta is one",
        "  fold (Fold 2: avgF1 0.74121 ref vs 0.70049 tpu) where float-level",
        "  trajectory divergence (XLA vs torch-BLAS accumulation order,",
        "  chained over 20 epochs x 40 videos of attention Adam steps)",
        "  flipped one discrete knapsack pick at one eval epoch.  corr at the",
        "  CV level agrees to <=6e-4 on both files.",
        "- `*-overfit` rows are single-fold train==test on the 6 SHORTEST",
        "  videos with 128/256-wide nets (same extra_params on both stacks —",
        "  the full-width reference SumGAN needs >10 h/config on this",
        "  single-core host): high variance by construction, and the DSN/GAN",
        "  families also consume independent sampling streams (Bernoulli",
        "  episodes, VAE noise), so their columns compare *distributions*,",
        "  not trajectories.  F1 on 6 near-untrained tiny videos is mostly",
        "  knapsack-on-noise variance; corr is the meaningful column there",
        "  (e.g. sumgan_att: 0.605 ref vs 0.591 tpu).",
        "- Wall-clock columns compare a torch-CPU epoch loop against the",
        "  compiled TPU programs *including* all XLA compiles and the",
        "  remote-TPU tunnel round-trips; see BENCH_NOTES.md for steady-state",
        "  throughput.",
    ]
    out = os.path.join(REPO, "PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({'complete' if ok else 'INCOMPLETE'})")


if __name__ == "__main__":
    cmd = sys.argv[1]
    only = sys.argv[3] if len(sys.argv) > 3 and sys.argv[2] == "--only" else None
    if cmd == "render":
        render()
    else:
        run(cmd, only)
