"""Benchmark sweep + results table (ref: summarizer/benchmark.py:19-108).

Trains a curated model sequence with best-known hparams over the canonical
splits and renders a psql-style table to the terminal and
``logs/<ts>_benchmark/table.txt``.  The reference wires in Random and
Logistic (benchmark.py:30-43); all seven families are wired here, each
gated by ``--models`` for partial sweeps.
"""

from __future__ import annotations

import argparse
import datetime
import re
import logging
import os
import time

# Persistent XLA compile cache, shared by every sweep child/attempt: the
# fold-parallel stacked programs are large one-off compiles (minutes), and
# retry-as-resume restarts the process — without the cache each retry pays
# the compile again.  Same setting as bench.py; scoped to the benchmark CLI
# (not the package) so CPU test runs never load cross-VM AOT artifacts.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import pandas as pd
from tabulate import tabulate

from summarizer_tpu.utils.config import HParameters

# Best-known per-model configs (epochs capped by --max-epochs).  The GAN
# models train with video groups of 8 (see train/adversarial.py): batch-1
# recurrent updates are HBM-bound on TPU; use ``--models`` + custom flags
# for exact reference batch-1 dynamics.
MODEL_CONFIGS = [
    # fold_parallel=1: supervised + REINFORCE families train all 5 CV folds
    # as one vmapped program (train/supervised.py, train/reinforce.py);
    # stacked-state resume keeps the sweep's retry-as-resume behavior.
    ("Random", {"model": "random", "epochs": 1, "fold_parallel": 1,
                "extra_params": {}}),
    # Round-5 per-family fold-parallel defaults from the warm end-to-end
    # A/B with CHAIN_RC success markers (logs/ab_foldparallel_summary.txt):
    # Logistic 1.99x, DSN 1.78x, VASNet_loc 1.72x SLOWER fold-parallel at
    # sweep budgets (their fused whole-CV programs out-cost the per-fold
    # dispatch they save), while DSN_sup 0.44x, VASNet 0.65x, vsLSTM 0.94x
    # win fold-parallel — so the default is per-family, not global.
    ("Logistic Regression", {"model": "logistic", "epochs": 30,
                             "fold_parallel": 0, "extra_params": {}}),
    ("VASNet", {"model": "vasnet", "epochs": 30, "fold_parallel": 1,
                "extra_params": {}}),
    # 30 s aperture at 2 feature-fps (the paper's best long-video config,
    # Summarizer.pdf §4.2) == 60 steps.
    ("VASNet_loc", {"model": "vasnet", "epochs": 30, "fold_parallel": 0,
                    "extra_params": {"local": 60}}),
    # Transformers stay fold-sequential (the stacked 6L encoder is HBM-bound
    # per step; clean A/B: 349 s fold-parallel vs 265 s sequential per
    # dataset) but now run FUSED with scan_layers=1: storing the encoder
    # stack as one stacked-(L,) pytree and scanning it makes the compiled
    # whole-run program carry the layer body once — round 2's unrolled fused
    # executable was ~39 MB (an ~8 min upload through the tunneled worker,
    # why it ran unfused); the scanned one uploads like every other family.
    ("Transformer", {"model": "transformer", "epochs": 30,
                     "extra_params": {"scan_layers": 1}}),
    # New family (no reference counterpart): MoE encoder, 4 experts top-2.
    ("Transformer-MoE", {"model": "transformer_moe", "epochs": 30, "fused": 0,
                         "extra_params": {}}),
    ("vsLSTM", {"model": "vslstm", "epochs": 30, "fold_parallel": 1,
                "extra_params": {}}),
    ("DSN", {"model": "dsn", "epochs": 20, "fold_parallel": 0,
             "extra_params": {}}),
    ("DSN_sup", {"model": "dsn", "epochs": 20, "fold_parallel": 1,
                 "extra_params": {"sup": 1}}),
    # GAN sweep defaults (VERDICT r2 item 1): video group 20 (divides both
    # canonical train folds, tvsum 40 / summe 20, so no videos are dropped
    # by the group reshape), int8 weight streaming with remat OFF — at
    # group >= 20 the int8 recurrences are MXU-compute-bound, so remat's
    # re-streaming costs more than the residual memory it saves
    # (BENCH_NOTES: 19.5 videos/s int8/group-24/remat-0 vs 12.3 bf16/20) —
    # and bucket=0 (one cached 3-phase executable per dataset).
    # Crash-recovery states are saved FULL (params + all 3 masked-Adam
    # chains) as sharded per-component files (train/resume.py::
    # save_state_sharded): the moments stream over the tunnel one component
    # at a time off the critical path, and a resumed fold bit-matches an
    # uninterrupted one (strict resume, VERDICT r2 item 8).  SumGAN stays
    # fold-sequential: its stacked 5-fold state is ~11.7 GB
    # (train/adversarial.py::_fold_parallel_fits would refuse).
    # resume_mid_fold=0: only fold-COMPLETE records are saved.  A sweep
    # fold is ~3-7 min of training, but each mid-fold insurance save pulls
    # the 2.2 GB state through the 20 MB/s tunnel (~2 min, twice per fold
    # with the post-pretrain snapshot) — the guaranteed cost exceeded the
    # crash risk it insured.  Retried folds replay bit-exactly from fold
    # start (same RNG stream), so recovery stays strict-parity.
    ("SumGAN", {"model": "sumgan", "epochs": 20,
                "extra_params": {"batch_size": 20, "pretrain_vae": 10,
                                 "int8": 1, "remat": 0, "scan_chunk": 2,
                                 "bucket": 0, "resume_final_light": 1,
                                 "resume_mid_fold": 0}}),
    ("SumGAN_sup", {"model": "sumgan", "epochs": 20,
                    "extra_params": {"batch_size": 20, "pretrain_vae": 10,
                                     "int8": 1, "remat": 0, "scan_chunk": 2,
                                     "sup": 1, "bucket": 0,
                                     "resume_final_light": 1,
                                     "resume_mid_fold": 0}}),
    # SumGAN-att is 48 M params (2.9 GB stacked) — the 5 folds train as one
    # vmapped program (train/adversarial.py::train_folds).
    ("SumGAN-att", {"model": "sumgan_att", "epochs": 20, "fold_parallel": 1,
                    "extra_params": {"batch_size": 10, "pretrain_ae": 20,
                                     "bf16": 1, "scan_chunk": 2, "bucket": 0,
                                     "remat": 0, "resume_final_light": 1,
                                     "resume_mid_fold": 0}}),
    # Table 1's upper-bound row: eval-only, each annotator vs the rest
    # (human_loo_rows).  epochs 0 — no training happens.
    ("Human (LOO)", {"model": "human", "epochs": 0, "extra_params": {}}),
]

# Per-dataset overrides applied on top of MODEL_CONFIGS when the sweep's
# splits file resolves to that dataset.  LOL (Twitch, 318 videos, 800-3200
# feature steps — datasets/README.md:50-74) is 10x the sequence length of
# TVSum/SumMe, so the recurrent GAN families get reduced budgets, per-group
# length bucketing (lengths spread 4x, so trimming each group to its own max
# saves most of the padded weight-streaming), rematerialized phase losses
# (T=3200 scan residuals exceed HBM), and smaller video groups; the 6-layer
# transformer gets a reduced budget (its flash path engages automatically at
# T >= 1024).  Budgets are recorded in the emitted table header.
DATASET_OVERRIDES = {
    "LOL": {
        # "*" applies to every family: at T=3200 the fused fold-parallel
        # whole-CV program OOMs HBM (5 stacked eval packs + the 4.2 GB
        # shared train pack + dense-attention temps), so LOL runs take the
        # classic per-epoch sequential path that the 318-video VASNet_loc
        # validation used; eval every 4 epochs halves the eval share of
        # wall-clock at these budgets.
        "*": {"fold_parallel": 0, "fused": 0, "test_every_epochs": 4},
        "VASNet": {"epochs": 20},
        "VASNet_loc": {"epochs": 20},
        "Transformer": {"epochs": 10},
        "Transformer-MoE": {"epochs": 10},
        "vsLSTM": {"epochs": 20},
        "DSN": {"epochs": 10},
        "DSN_sup": {"epochs": 10},
        # GAN budgets sized from a measured probe: the 2048-wide recurrent
        # VAE streams its weights per timestep, so LOL's mean T~2000 costs
        # ~7x a TVSum epoch; batch 10 halves the per-video streaming vs 5
        # and ~3 epochs + 2 pretrain keeps a family's 5-fold CV near an
        # hour on one chip.
        # HBM calibration (round 4, measured by failed-attempt bisection):
        # batch 10 + f32 pack OOMs at the FIRST phase backward; batch 8 +
        # bf16 pack gets through step_s/step_d and OOMs at step_c (the
        # deepest chain: grads through generator+discriminator on both
        # decodes).  The 4.2 GB padded f32 pack -> 2.1 bf16 (pack_dtype;
        # the bf16 cells cast features at the matmuls regardless,
        # nn/policy.py), batch 6 trims phase residuals another ~25%, and
        # int8 weight streaming (same knob as the committed summe/tvsum GAN
        # rows) drops the streamed copies and buys back the smaller batch's
        # throughput (~+38% at equal dynamics, BENCH_NOTES).
        # batch 4: bisected on-device (scripts note in /tmp/repro_lol_step) —
        # the (B, T=3200) step_c backward OOMs at B=6 even with int8+remat+
        # bf16 pack, fits at B<=4 (steady 4.5 s/group at the worst bucket).
        # resume_mid_fold=1 + save_sync=1 (unlike the summe/tvsum GAN rows):
        # a LOL fold at batch 4 (~15 min) exceeds the tunneled worker's
        # ~8-min MTBF under sustained GAN load, so without the post-pretrain
        # snapshot and gated mid-fold saves every retry restarts the fold
        # from zero — a livelock, observed live in round 4.  save_sync keeps
        # the 2.3 GB state pull from pinning a stale device copy alongside
        # the next epoch's allocations (the batch-6 OOM margin).
        "SumGAN": {"epochs": 3, "test_every_epochs": 2,
                   "extra_params": {"batch_size": 4, "pretrain_vae": 2,
                                    "remat": 1, "bucket": 1, "split_phases": 1,
                                    "bucket_quantum": 1024,
                                    "resume_final_light": 1, "int8": 1,
                                    "resume_mid_fold": 1, "save_sync": 1,
                                    "pack_dtype": "bfloat16"}},
        "SumGAN_sup": {"epochs": 3, "test_every_epochs": 2,
                       "extra_params": {"batch_size": 4, "pretrain_vae": 2,
                                        "remat": 1, "bucket": 1,
                                        "split_phases": 1,
                                        "bucket_quantum": 1024, "resume_final_light": 1,
                                        "int8": 1, "resume_mid_fold": 1,
                                        "save_sync": 1,
                                        "pack_dtype": "bfloat16"}},
        "SumGAN-att": {"epochs": 3, "test_every_epochs": 2,
                       "extra_params": {"batch_size": 6, "pretrain_ae": 4,
                                        "remat": 1, "bucket": 1,
                                        "split_phases": 1,
                                        "bucket_quantum": 1024, "resume_final_light": 1,
                                        "resume_mid_fold": 1, "save_sync": 1,
                                        "pack_dtype": "bfloat16"}},
    },
    "summe": {
        # The (group=20, T=641) 3-phase SumGAN program aborts the tunneled
        # TPU worker deterministically — independent of int8/bf16, remat,
        # split_phases, and the Pallas RNN kernels, while VAE pretrain at
        # the same shape and (group=20, T=633) TVSum both run; group <= 16
        # is fine (QUIRKS.md).  Group 10 also keeps all 20 train videos of
        # a SumMe fold in every epoch (20 % 10 == 0; a 16-group would drop
        # a rotating 4), at ~2x the per-video step cost of 20.
        "SumGAN": {"extra_params": {"batch_size": 10}},
        "SumGAN_sup": {"extra_params": {"batch_size": 10}},
    },
}


def human_loo_rows(splits_files: str, datasets: str | None = None):
    """Table 1's "Human, leave-one-out (upper bound)" row — eval-only, no
    training: each annotator scored against the rest directly from the
    dataset annotations (ops/eval_np.py::human_leave_one_out; the reference
    computes this nowhere — the row exists only in Summarizer.pdf Table 1).
    Single-annotator LOL yields NaN cells, the paper's "—"."""
    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.data.splits import parse_splits_filename
    from summarizer_tpu.ops.eval_np import human_leave_one_out
    from summarizer_tpu.utils.fingerprint import fixture_tag

    date = datetime.date.today().isoformat()
    rows = []
    for sf in splits_files.split(","):
        ds_name, _ = parse_splits_filename(sf)
        h5 = datasets or os.path.join(
            "datasets", f"summarizer_dataset_{ds_name}_google_pool5.h5"
        )
        t0 = time.time()
        ds = SummarizerDataset(h5)
        corr, avg_f, max_f = human_leave_one_out(list(ds.videos.values()))
        wall = round(time.time() - t0, 1)
        rows.append(["Human (LOO)", sf, corr, avg_f, max_f, wall,
                     "(eval-only)", f"{fixture_tag(h5)} e0 {date}"])
        logging.info(
            f"File: {sf}  Corr: {corr: 0.5f}  Avg F-score: {avg_f:0.5f}  "
            f"Max F-score: {max_f:0.5f}  ({wall:.0f}s total)"
        )
    return rows


def benchmark_model(name: str, args: dict):
    if args.get("model") == "human":
        return human_loo_rows(args["splits_files"], args.get("datasets"))
    logging.info(f"Train {name} model...")
    hps = HParameters()
    hps.load_from_args(args)
    from summarizer_tpu.train.loop import train

    t0 = time.time()
    results = train(hps)
    wall = time.time() - t0
    rows = []
    from summarizer_tpu.utils.fingerprint import fixture_tag

    date = datetime.date.today().isoformat()
    for splits_file, corr, avg_f, max_f in results:
        # Per-row provenance: exact fixture bytes (md5-8 of the h5 this row
        # was measured on), date, and epoch budget — so a later merge can
        # detect rows measured on a since-regenerated fixture (VERDICT r3).
        fixture = (
            f"{fixture_tag(hps.dataset_of_file[splits_file])} "
            f"e{hps.epochs} {date}"
        )
        rows.append([name, splits_file, corr, avg_f, max_f,
                     round(wall / max(len(results), 1), 1), hps.log_path,
                     fixture])
        phases = getattr(hps, "_phase_walls", {}).get(splits_file)
        phase_str = (
            f"  [setup {phases[0]:.1f}s train+eval {phases[1]:.1f}s "
            f"predict {phases[2]:.1f}s]" if phases else ""
        )
        logging.info(
            f"File: {splits_file}  Corr: {corr: 0.5f}  "
            f"Avg F-score: {avg_f:0.5f}  Max F-score: {max_f:0.5f}  "
            f"({wall:.0f}s total){phase_str}"
        )
    hps.writer.close()
    return rows


def _provenance(splits_files: str) -> str:
    """One-line data-provenance label so quality columns can't be mistaken
    for real-dataset (Table 1) numbers when the h5s are synthetic fixtures."""
    import h5py

    names = []
    for sf in splits_files.split(","):
        from summarizer_tpu.data.splits import parse_splits_filename

        ds_name, _ = parse_splits_filename(sf)
        path = os.path.join("datasets", f"summarizer_dataset_{ds_name}_google_pool5.h5")
        tag = ds_name
        try:
            with h5py.File(path, "r") as f:
                if bool(f.attrs.get("synthetic", False)):
                    tag += " (SYNTHETIC fixture)"
                else:
                    tag += " (real)"
        except OSError:
            tag += " (missing h5)"
        names.append(tag)
    return "Data: " + ", ".join(names)


def show_save_results(table: pd.DataFrame, log_path: str, header: str = ""):
    table_str = tabulate(table, headers="keys", tablefmt="psql", showindex=False)
    if header:
        table_str = header + "\n" + table_str
    print(table_str)
    os.makedirs(log_path, exist_ok=True)
    with open(os.path.join(log_path, "table.txt"), "w") as f:
        f.write(table_str)
    logging.info(f"Table saved in {os.path.join(log_path, 'table.txt')}")


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s::%(levelname)s: %(message)s")
    parser = argparse.ArgumentParser("summarizer_tpu : Benchmark")
    parser.add_argument("-e", "--max-epochs", type=int, default=300)
    parser.add_argument(
        "-s",
        "--splits-files",
        type=str,
        default="splits/tvsum_splits.json,splits/summe_splits.json",
    )
    parser.add_argument("--models", type=str, default=None,
                        help="Comma list of model keys to run (default: all)")
    parser.add_argument("--datasets", type=str, default=None)
    parser.add_argument("--one", type=str, default=None, help=argparse.SUPPRESS)
    parser.add_argument("--in-process", action="store_true",
                        help="Run configs in this process (no crash isolation)")
    parser.add_argument("--set", action="append", default=[], dest="overrides",
                        help="k=v applied to every selected config AFTER the "
                             "dataset overrides (A/B probes: --set "
                             "fold_parallel=0). Known top-level keys override "
                             "the run args; anything else lands in "
                             "extra_params.")
    args, _ = parser.parse_known_args(argv)

    def run_args_for(cfg, name=None):
        run_args = dict(cfg)
        run_args["extra_params"] = dict(run_args.get("extra_params", {}))
        # Dataset-specific overrides (child mode only passes one splits file;
        # parent subprocess dispatch hands each file to its own child, so a
        # multi-file -s at the top level still picks the right overrides).
        from summarizer_tpu.data.splits import parse_splits_filename

        ds_names = {parse_splits_filename(sf)[0]
                    for sf in args.splits_files.split(",")}
        if name is not None and len(ds_names) == 1:
            per_ds = DATASET_OVERRIDES.get(next(iter(ds_names)), {})
            for ov in (per_ds.get("*", {}), per_ds.get(name, {})):
                for k, v in ov.items():
                    if k == "extra_params":
                        run_args["extra_params"].update(v)
                    else:
                        run_args[k] = v
        for kv in args.overrides:
            k, _, v = kv.partition("=")
            v = float(v) if re.match(r"^-?\d+\.\d*$", v) else (
                int(v) if re.match(r"^-?\d+$", v) else v)
            if k in ("epochs", "fold_parallel", "fused", "test_every_epochs",
                     "model", "datasets"):
                run_args[k] = v
            else:
                run_args["extra_params"][k] = v
        run_args["epochs"] = min(run_args["epochs"], args.max_epochs)
        run_args["splits_files"] = args.splits_files
        run_args["log_level"] = "error"
        if args.datasets:
            run_args["datasets"] = args.datasets
        return run_args

    if args.one is not None:
        # Child mode: run ONE config and emit machine-readable rows.  A
        # stable per-config log dir + --resume makes a retry after a worker
        # crash CONTINUE from the last checkpointed fold/epoch rather than
        # restart from scratch.
        import json

        cfg = dict(dict(MODEL_CONFIGS)[args.one])
        ra = run_args_for(cfg, args.one)
        slug = re.sub(r"[^A-Za-z0-9]+", "_", args.one).lower()
        ra["log_dir"] = os.path.join("logs", f"bench_{slug}")
        ra["resume"] = True
        for row in benchmark_model(args.one, ra):
            print("BENCHROW " + json.dumps(row), flush=True)
        return

    log_path = os.path.join(
        "logs", f"{int(datetime.datetime.now().timestamp())}_benchmark"
    )
    wanted = set(args.models.split(",")) if args.models else None

    # Make the sweep evictable: bench.py's round-end _stop_sweeps kills the
    # exact pids recorded in /tmp/benchmark*.pid.  Round 2 lost its official
    # artifact to an unevictable orphan (the pid file named a dead launcher
    # while this wrapper and its training child lived on), so the wrapper
    # registers ITSELF and forwards SIGTERM to whichever child currently
    # holds the TPU before exiting.
    import signal

    pid_file = f"/tmp/benchmark_{os.getpid()}.pid"
    try:
        with open(pid_file, "w") as f:
            f.write(str(os.getpid()))
        import atexit

        atexit.register(lambda: os.path.exists(pid_file) and os.unlink(pid_file))
    except OSError:
        pid_file = None
    active_child: list = [None]

    def _evict(signum, frame):
        child = active_child[0]
        if child is not None and child.poll() is None:
            child.terminate()
            try:
                child.wait(timeout=20)
            except Exception:
                child.kill()
        if pid_file:
            try:
                os.unlink(pid_file)
            except OSError:
                pass
        raise SystemExit(143)

    signal.signal(signal.SIGTERM, _evict)

    rows = []
    for name, cfg in MODEL_CONFIGS:
        # Match either the model key (all variants: "sumgan" = SumGAN +
        # SumGAN_sup) or the exact display name ("SumGAN_sup" alone).
        if wanted is not None and cfg["model"] not in wanted and name not in wanted:
            continue
        if args.in_process:
            rows += benchmark_model(name, run_args_for(cfg, name))
            continue
        # Each (family, splits file) runs in its own subprocess: a remote-TPU
        # worker crash poisons the in-process JAX backend beyond recovery, so
        # isolation + retry-as-resume is the only way a fault doesn't lose
        # the sweep.  One dataset per child on purpose — the observed worker
        # crashes cluster at the dataset switch (new executables loading
        # after ~30 min of sustained GAN load), and a fresh process per
        # dataset both avoids that and caps what one crash can take down.
        import json
        import subprocess
        import sys as _sys

        for sf in args.splits_files.split(","):
            child = [_sys.executable, "-m", "summarizer_tpu.cli.benchmark",
                     "--one", name, "-e", str(args.max_epochs), "-s", sf]
            if args.datasets:
                child += ["--datasets", args.datasets]
            for kv in args.overrides:
                child += ["--set", kv]
            got = False
            # 8 attempts: the tunneled worker dies roughly every 10 min of
            # sustained GAN load while a GAN (config, dataset) needs ~45 min
            # of training — with resume-everything each attempt makes net
            # progress, so the budget must cover train_time/MTBF, not 1-2
            # flakes.
            import re as _re

            slug_dir = os.path.join(
                "logs", "bench_" + _re.sub(r"[^A-Za-z0-9]+", "_", name).lower()
            )

            def _progress_mtime():
                newest = 0.0
                try:
                    for fn in os.listdir(slug_dir):
                        newest = max(
                            newest, os.path.getmtime(os.path.join(slug_dir, fn))
                        )
                except OSError:
                    pass
                return newest

            for attempt in range(1, 9):
                # Popen + progress watchdog instead of a blocking run(): when
                # the worker dies mid-RPC the child HANGS at ~0% CPU until
                # the overall timeout — observed 50 min of dead air.  The
                # child's log dir (events, metrics.csv, state ckpts) mtimes
                # advance every test epoch / gated save, so "no file touched
                # for 8 min after a 5-min grace" means a dead worker, not a
                # slow fold.
                import tempfile

                with tempfile.TemporaryFile("w+") as fo, \
                        tempfile.TemporaryFile("w+") as fe:
                    # Files, not pipes: a child's stderr logging would fill a
                    # 64 KB pipe and block it (indistinguishable from a stall).
                    p = subprocess.Popen(child, stdout=fo, stderr=fe, text=True)
                    active_child[0] = p
                    deadline = time.monotonic() + 3600
                    start_wall = time.time()  # getmtime is wall-clock
                    rc = None

                    def _cpu_s():
                        # Child CPU seconds (utime+stime).  A worker-side
                        # compile blocks the child in an RPC for 10+ min with
                        # NO file progress but a slow CPU trickle (deserialize
                        # + ping loops, ~1-3% CPU); a dead-worker hang sits at
                        # ~0%.  Killing a mid-compile child is worse than
                        # useless: nothing lands in the AOT cache, so every
                        # retry re-buys the same compile and the attempt
                        # budget burns with zero net progress.
                        try:
                            with open(f"/proc/{p.pid}/stat") as f:
                                parts = f.read().rsplit(") ", 1)[1].split()
                            return (int(parts[11]) + int(parts[12])) / os.sysconf(
                                "SC_CLK_TCK"
                            )
                        except (OSError, IndexError, ValueError):
                            return None
                    last_cpu, last_cpu_t = _cpu_s(), time.time()
                    while True:
                        try:
                            rc = p.wait(timeout=30)
                            break
                        except subprocess.TimeoutExpired:
                            pass
                        cpu = _cpu_s()
                        if cpu is not None and last_cpu is not None and (
                            cpu - last_cpu
                        ) >= 0.25:
                            last_cpu, last_cpu_t = cpu, time.time()
                        stalled = (
                            time.time()
                            - max(_progress_mtime(), start_wall + 300) > 480
                        ) and (time.time() - last_cpu_t > 480)
                        if time.monotonic() > deadline or stalled:
                            p.kill()
                            rc = "stalled" if stalled else "timeout"
                            try:
                                p.wait(timeout=30)
                            except subprocess.TimeoutExpired:
                                pass
                            break
                    fo.seek(0)
                    out = fo.read()
                    fe.seek(0)
                    err = str(rc) if rc in ("stalled", "timeout") else fe.read()[-2000:]
                new = [json.loads(l[len("BENCHROW "):])
                       for l in out.splitlines() if l.startswith("BENCHROW ")]
                if new:
                    rows += new
                    got = True
                    # Durable row log: the in-memory `rows` die with the
                    # wrapper (hours of sweep on a flaky worker), so every
                    # captured row is appended here immediately and
                    # scripts/merge_benchmark_tables.py can recover them.
                    os.makedirs("logs", exist_ok=True)
                    with open("logs/benchmark_rows.jsonl", "a") as f:
                        for r in new:
                            f.write(json.dumps(r) + "\n")
                    break
                logging.error(
                    f"{name} [{sf}] attempt {attempt} failed (rc={rc}): "
                    f"{str(err)[-300:]}"
                )
                # The tunneled TPU worker needs time to come back after a
                # crash; the retry resumes from per-fold checkpoints.
                time.sleep(180)
            if not got:
                rows.append([name, sf, float("nan"), float("nan"),
                             float("nan"), float("nan"), "FAILED", ""])

    table = pd.DataFrame(
        rows,
        columns=["Model", "File", "Correlation", "Avg F-score", "Max F-score",
                 "Wall (s/file)", "Logs", "Fixture"],
    )
    show_save_results(table, log_path, header=_provenance(args.splits_files))


if __name__ == "__main__":
    main()
