"""Egress-day, one command: download -> (normalize) -> benchmark -> Table-1 check.

The real SumMe/TVSum/LOL h5s need network egress; everything downstream of the
bytes is already built and rehearsed offline (tests/test_egress_rehearsal.py
drives the GDrive confirm-token dance + eccv16 normalization + a training fold
against a mock server).  This command chains the whole path so the day egress
opens costs zero engineering:

    python -m summarizer_tpu.cli.reproduce            # real data, full budgets
    python -m summarizer_tpu.cli.reproduce --dry-run  # offline rehearsal (synthetic)

Steps:
  1. ``cli.download`` — the reference's Google Drive file ids
     (/root/reference/summarizer/utils/io.py:15-36); the preprocessed h5s are
     distributed already-normalized, so ``cli.normalize`` is only needed for
     upstream eccv16 files (flagged via --eccv16-dir).
  2. ``cli.benchmark`` — the full Table-1 sweep (reference benchmark.py:19-48
     semantics) on summe+tvsum+LOL; rows land durably in
     logs/benchmark_rows.jsonl as they complete.
  3. ``scripts/merge_benchmark_tables.py`` — provenance-checked
     BENCHMARK_TABLE.txt (per-row fixture md5, stale rows refused).
  4. Compare every measured cell against the paper's Table 1
     (Summarizer.pdf Table 1, transcribed in BASELINE.md) and exit non-zero
     if any Avg-F1 delta exceeds --f1-tol (the BASELINE.json north-star
     parity gate).  With --dry-run the comparison is informational: the
     synthetic fixtures share the schema, not the content, of the real data.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

# Summarizer.pdf Table 1 (via BASELINE.md): (model, dataset) ->
# (avg_f1, max_f1, corr).  LOL has a single annotator, so its one published
# F1 fills both avg and max.
TABLE1 = {
    ("Random", "tvsum"): (0.546, 0.743, 0.002),
    ("Random", "summe"): (0.215, 0.450, 0.003),
    ("Random", "LOL"): (0.125, 0.125, 0.003),
    ("Logistic Regression", "tvsum"): (0.592, 0.817, 0.232),
    ("Logistic Regression", "summe"): (0.228, 0.487, 0.109),
    ("Logistic Regression", "LOL"): (0.482, 0.482, 0.355),
    ("VASNet", "tvsum"): (0.582, 0.803, 0.233),
    ("VASNet", "summe"): (0.229, 0.479, 0.112),
    ("VASNet", "LOL"): (0.568, 0.568, 0.402),
    ("VASNet_loc", "tvsum"): (0.580, 0.812, 0.246),
    ("VASNet_loc", "summe"): (0.231, 0.483, 0.147),
    ("VASNet_loc", "LOL"): (0.642, 0.642, 0.453),
    ("Transformer", "tvsum"): (0.576, 0.805, 0.233),
    ("Transformer", "summe"): (0.225, 0.483, 0.116),
    ("Transformer", "LOL"): (0.596, 0.596, 0.424),
    ("DSN", "tvsum"): (0.570, 0.801, 0.156),
    ("DSN", "summe"): (0.232, 0.494, 0.057),
    ("DSN", "LOL"): (0.154, 0.154, 0.086),
    ("DSN_sup", "tvsum"): (0.587, 0.817, 0.248),
    ("DSN_sup", "summe"): (0.230, 0.473, 0.069),
    ("DSN_sup", "LOL"): (0.556, 0.556, 0.413),
    ("SumGAN", "tvsum"): (0.557, 0.781, -0.019),
    ("SumGAN", "summe"): (0.230, 0.467, 0.058),
    ("SumGAN", "LOL"): (0.331, 0.331, 0.264),
    ("SumGAN_sup", "tvsum"): (0.587, 0.809, 0.226),
    ("SumGAN_sup", "summe"): (0.230, 0.486, 0.073),
    ("SumGAN_sup", "LOL"): (0.428, 0.428, 0.329),
    ("SumGAN-att", "tvsum"): (0.589, 0.827, 0.198),
    ("SumGAN-att", "summe"): (0.229, 0.454, 0.090),
    ("SumGAN-att", "LOL"): (0.565, 0.565, 0.407),
    # Upper bound, eval-only (no LOL cell: single annotator, paper's "—").
    ("Human (LOO)", "tvsum"): (0.538, 0.775, 0.204),
    ("Human (LOO)", "summe"): (0.311, 0.543, 0.329),
}


def _run(cmd, **kw):
    print(f"\n$ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, **kw).returncode


def _dataset_of(splits_file: str) -> str:
    base = os.path.basename(splits_file)
    for name in ("summe", "tvsum", "LOL"):
        if base.startswith(name):
            return name
    return base


def compare_vs_table1(f1_tol: float, informational: bool,
                      table: str = "BENCHMARK_TABLE.txt") -> int:
    """Parse the merged table and diff it against the paper's Table 1."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from scripts.merge_benchmark_tables import parse_table

    rows = parse_table(table)
    failures, compared = [], 0
    print(f"\n{'model':<20} {'ds':<6} {'avgF1':>7} {'paper':>7} {'dF1':>7} "
          f"{'corr':>7} {'paper':>7}")
    for model, sf, corr, avg_f, max_f, _wall, *_ in rows:
        ref = TABLE1.get((model, _dataset_of(sf)))
        if ref is None:
            continue  # families beyond Table 1 (Transformer-MoE, vsLSTM)
        compared += 1
        d = avg_f - ref[0]
        flag = "" if abs(d) <= f1_tol else "  <-- OUT OF TOLERANCE"
        print(f"{model:<20} {_dataset_of(sf):<6} {avg_f:7.3f} {ref[0]:7.3f} "
              f"{d:+7.3f} {corr:7.3f} {ref[2]:7.3f}{flag}")
        if abs(d) > f1_tol:
            failures.append((model, sf, d))
    missing = sorted(
        k for k in TABLE1
        if not any(r[0] == k[0] and _dataset_of(r[1]) == k[1] for r in rows)
    )
    for k in missing:
        print(f"MISSING cell: {k[0]} / {k[1]}")
    print(f"\ncompared {compared}/{len(TABLE1)} Table-1 cells, "
          f"{len(failures)} outside ±{f1_tol} Avg-F1")
    if informational:
        print("(dry run on synthetic fixtures: deltas are informational — "
              "the gate applies to real data)")
        return 0
    return 1 if failures or missing else 0


def main(argv=None):
    p = argparse.ArgumentParser(
        "reproduce", description="download -> benchmark -> Table-1 parity gate"
    )
    p.add_argument("--dry-run", action="store_true",
                   help="offline rehearsal: synthetic fixtures, 1-epoch "
                        "budgets, two families, informational comparison")
    p.add_argument("--skip-download", action="store_true",
                   help="datasets/ already populated")
    p.add_argument("--models", default=None,
                   help="comma list passed to cli.benchmark (default: all)")
    p.add_argument("--f1-tol", type=float, default=0.05,
                   help="Avg-F1 parity gate vs Table 1 (real data only)")
    args = p.parse_args(argv)

    py = sys.executable
    if not args.skip_download:
        dl = [py, "-m", "summarizer_tpu.cli.download"]
        if args.dry_run:
            dl.append("--synthetic")
        if _run(dl):
            raise SystemExit("download failed")

    bench = [py, "-m", "summarizer_tpu.cli.benchmark",
             "-s", "splits/summe_splits.json,splits/tvsum_splits.json,"
                   "splits/LOL_splits.json"]
    if args.dry_run:
        bench += ["--models", args.models or "random,logistic",
                  "-e", "1", "--in-process"]
    elif args.models:
        bench += ["--models", args.models]
    if _run(bench):
        raise SystemExit("benchmark sweep failed")

    # Subprocess-mode rows land durably in logs/benchmark_rows.jsonl, which
    # the merge reads by itself; the --dry-run in-process sweep only writes
    # its own table.txt, so pass the freshest one explicitly.
    merge_cmd = [py, "scripts/merge_benchmark_tables.py"]
    scratch_table = None
    if args.dry_run:
        # Rehearsal rows (1-epoch, possibly CPU) must never displace the
        # committed full-budget grid: merge into a scratch table instead.
        # mkstemp under logs/ (not a fixed world-shared /tmp path): two
        # concurrent dry runs must not race each other's table, and a
        # pre-created/symlinked path must not be followed.
        import tempfile

        os.makedirs("logs", exist_ok=True)
        fd, scratch_table = tempfile.mkstemp(
            prefix="reproduce_dryrun_table_", suffix=".txt", dir="logs")
        os.close(fd)
        merge_cmd += ["--out", scratch_table]
    tables = sorted(
        glob.glob("logs/*_benchmark/table.txt"), key=os.path.getmtime
    )
    if tables:
        merge_cmd.append(tables[-1])
    if _run(merge_cmd):
        raise SystemExit("table merge failed")

    raise SystemExit(compare_vs_table1(
        args.f1_tol, informational=args.dry_run,
        table=scratch_table if args.dry_run else "BENCHMARK_TABLE.txt"))


if __name__ == "__main__":
    main()
