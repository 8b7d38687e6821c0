"""Summarize the fold-parallel vs sequential A/B (VERDICT r3 item 4).

Reads logs/ab_foldparallel.txt as written by scripts/r4_fix_chain.sh block D:
blocks of

    --- <model> fold_parallel=<0|1>
    CHAIN_TIME real <seconds> s

and prints a per-family table (fp=1 wall, fp=0 wall, ratio, winner) plus the
recommended MODEL_CONFIGS default per family.  This is the end-to-end number
(process start -> table written, including compile, dispatch, eval and the
sweep's own overhead) — the quantity the sweep default should optimize, as
opposed to bench.py's fold5 row which isolates steady-state epoch compute.

Usage: python scripts/summarize_ab.py [logs/ab_foldparallel.txt]
"""

import re
import sys


def parse(path):
    walls = {}  # (model, fp) -> seconds
    current = None
    for line in open(path):
        m = re.match(r"--- (.+) fold_parallel=(\d)", line.strip())
        if m:
            current = (m.group(1), int(m.group(2)))
            continue
        m = re.search(r"CHAIN_TIME real ([\d.]+) s", line)
        if m and current:
            walls[current] = float(m.group(1))
            current = None
    return walls


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "logs/ab_foldparallel.txt"
    walls = parse(path)
    models = sorted({m for m, _ in walls})
    print(f"{'family':<22} {'fp=1 (s)':>9} {'fp=0 (s)':>9} {'fp1/fp0':>8}  "
          "recommended default")
    for m in models:
        w1, w0 = walls.get((m, 1)), walls.get((m, 0))
        if w1 is None or w0 is None:
            print(f"{m:<22} {'?' if w1 is None else w1:>9} "
                  f"{'?' if w0 is None else w0:>9}  (incomplete A/B)")
            continue
        ratio = w1 / w0
        rec = "fold_parallel=1" if ratio < 1.0 else "fold_parallel=0"
        print(f"{m:<22} {w1:>9.1f} {w0:>9.1f} {ratio:>8.2f}  {rec}")


if __name__ == "__main__":
    main()
