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
    """(model, fp) -> (wall seconds, ok).

    ``ok`` comes from the ``CHAIN_RC <n>`` line the chain writes after each
    CHAIN_TIME (rc 0 AND 'Table saved' seen in the run log).  A crashed run
    (e.g. a fast RESOURCE_EXHAUSTED) otherwise shows up as a SMALL wall and
    would flip the recommended default — the advisor's round-4 finding.
    Legacy blocks without a CHAIN_RC line parse as ok=None (unknown)."""
    walls = {}
    current = pending = None
    for line in open(path):
        m = re.match(r"--- (.+) fold_parallel=(\d)", line.strip())
        if m:
            if pending:
                walls[pending[0]] = (pending[1], None)
            current, pending = (m.group(1), int(m.group(2))), None
            continue
        m = re.search(r"CHAIN_TIME real ([\d.]+) s", line)
        if m and current:
            pending, current = (current, float(m.group(1))), None
            continue
        m = re.search(r"CHAIN_RC (\d+)", line)
        if m and pending:
            walls[pending[0]] = (pending[1], int(m.group(1)) == 0)
            pending = None
    if pending:
        walls[pending[0]] = (pending[1], None)
    return walls


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "logs/ab_foldparallel.txt"
    walls = parse(path)
    models = sorted({m for m, _ in walls})
    print(f"{'family':<22} {'fp=1 (s)':>9} {'fp=0 (s)':>9} {'fp1/fp0':>8}  "
          "recommended default")
    for m in models:
        cells = []
        for fp in (1, 0):
            wall, ok = walls.get((m, fp), (None, None))
            # A failed run's wall is meaningless (often small): show '?'
            # and never use it in the ratio.
            cells.append(None if wall is None or ok is False else wall)
            if ok is False:
                print(f"{m:<22} fold_parallel={fp} run FAILED "
                      f"(wall {wall:.1f}s ignored)")
        w1, w0 = cells
        if w1 is None or w0 is None:
            print(f"{m:<22} {'?' if w1 is None else w1:>9} "
                  f"{'?' if w0 is None else w0:>9}  (incomplete A/B)")
            continue
        ratio = w1 / w0
        rec = "fold_parallel=1" if ratio < 1.0 else "fold_parallel=0"
        print(f"{m:<22} {w1:>9.1f} {w0:>9.1f} {ratio:>8.2f}  {rec}")


if __name__ == "__main__":
    main()
