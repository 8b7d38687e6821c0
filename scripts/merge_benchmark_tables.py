"""Merge full-budget benchmark results into one BENCHMARK_TABLE.txt.

The full sweep ran in two pieces (a remote-TPU worker crash killed the GAN
tail of the first run): supervised/REINFORCE families logged to
/tmp/benchmark_full.log, GAN families re-ran via the crash-isolated sweep
(logs/<ts>_benchmark/table.txt).  This stitches both into the repo-root
table with the data-provenance header.

Usage: python scripts/merge_benchmark_tables.py <gan_table.txt> [log ...]
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROW = re.compile(
    r"INFO: File: (\S+)  Corr:\s*(-?\d+\.\d+)  Avg F-score: (\d+\.\d+)  "
    r"Max F-score: (\d+\.\d+)  \((\d+)s total\)"
)
TRAIN = re.compile(r"INFO: Train (.+) model\.\.\.")


def parse_log(path):
    rows, current = [], None
    for line in open(path):
        m = TRAIN.search(line)
        if m:
            current = m.group(1)
            continue
        m = ROW.search(line)
        if m and current:
            sf, corr, af, mf, wall = m.groups()
            rows.append([current, sf, float(corr), float(af), float(mf),
                         round(float(wall) / 2, 1), "(log)"])
    return rows


def parse_table(path):
    rows = []
    for line in open(path):
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) == 7 and cells[0] not in ("Model", "") \
                and not set(line) <= set("+-|= \n"):
            try:
                rows.append([cells[0], cells[1], float(cells[2]), float(cells[3]),
                             float(cells[4]), float(cells[5]), cells[6]])
            except ValueError:
                continue
    return rows


def main():
    os.chdir(REPO)
    import pandas as pd
    from tabulate import tabulate

    from summarizer_tpu.cli.benchmark import _provenance

    import json

    legacy = "/tmp/benchmark_full.log"
    rows = parse_log(legacy) if os.path.exists(legacy) else []
    seen = {(r[0], r[1]) for r in rows}

    def add(r):
        if (r[0], r[1]) not in seen:
            rows.append(r)
            seen.add((r[0], r[1]))

    # Durable per-row log written by the sweep wrapper (survives wrapper
    # crashes); later lines are fresher, so take them newest-first.
    if os.path.exists("logs/benchmark_rows.jsonl"):
        for line in reversed(open("logs/benchmark_rows.jsonl").read().splitlines()):
            if line.strip():
                add(json.loads(line))
    for path in sys.argv[1:]:
        for r in parse_table(path):
            add(r)
    # Finally, rows already in the committed repo table (a fresh VM loses
    # /tmp logs and logs/; fresher sources above win on duplicates).
    if os.path.exists("BENCHMARK_TABLE.txt"):
        for r in parse_table("BENCHMARK_TABLE.txt"):
            add(r)

    order = ["Random", "Logistic Regression", "VASNet", "VASNet_loc",
             "Transformer", "Transformer-MoE", "vsLSTM", "DSN", "DSN_sup",
             "SumGAN", "SumGAN_sup", "SumGAN-att"]
    rows.sort(key=lambda r: (order.index(r[0]) if r[0] in order else 99, r[1]))

    table = pd.DataFrame(rows, columns=["Model", "File", "Correlation",
                                        "Avg F-score", "Max F-score",
                                        "Wall (s/file)", "Logs"])
    files = sorted({r[1] for r in rows})
    header = (_provenance(",".join(files))
              + "\nBudgets: per-family best-known epochs "
              "(cli/benchmark.py MODEL_CONFIGS; reference benchmark.py:30-43;"
              "\nLOL rows at the reduced DATASET_OVERRIDES budgets — "
              "column 6 is wall seconds per splits file)")
    out = header + "\n" + tabulate(table, headers="keys", tablefmt="psql",
                                   showindex=False)
    with open("BENCHMARK_TABLE.txt", "w") as f:
        f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
