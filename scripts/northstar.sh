#!/bin/bash
# North-star measurement (BASELINE.md): the 6 supervised/REINFORCE reference
# families (Random, Logistic, VASNet incl. _loc, Transformer, DSN incl. _sup)
# at full sweep budgets on SumMe+TVSum, one warm in-process run, ONE bash
# `time` around the whole command.  Row walls land in the table via the
# sweep; the TOTAL here is the number BASELINE.md's "<5 min" refers to.
# Run AFTER a cold sweep has populated the XLA AOT compile cache (the
# measurement is "benchmark re-run wall", not "first-ever compile wall").
set -u
cd "$(dirname "$0")/.."
TIMEFORMAT='NORTHSTAR_TOTAL real %R s'
SUP=random,logistic,vasnet,transformer,dsn

TOTAL_LINE=$( { time python -m summarizer_tpu.cli.benchmark --models $SUP \
    --in-process > /tmp/northstar.log 2>&1 ; } 2>&1 )
echo "$TOTAL_LINE"
grep -aE "total\)" /tmp/northstar.log | tail -16

# Durable JSON artifact (VERDICT r3 item 3): the one citable number, with
# the measured tunnel-link context from BENCH_NOTES.md.
SECS=$(echo "$TOTAL_LINE" | sed -n 's/.*NORTHSTAR_TOTAL real \(.*\) s.*/\1/p')
python - "$SECS" <<'EOF'
import datetime, json, sys
rec = {
    "northstar_total_s": float(sys.argv[1]),
    "date": datetime.date.today().isoformat(),
    "families": "random,logistic,vasnet(+loc),transformer,dsn(+sup)",
    "datasets": "summe+tvsum (5-fold CV each, full sweep budgets)",
    "target_s": 300,
    "hardware": "1x TPU v5e via tunneled worker "
                "(device_get ~20.1 MB/s, executable upload ~6.4 MB/s)",
}
with open("logs/northstar.json", "w") as f:
    json.dump(rec, f, indent=1)
with open("NORTHSTAR.json", "w") as f:  # the committed root artifact
    json.dump(rec, f, indent=1)
print("WROTE logs/northstar.json + NORTHSTAR.json:",
      rec["northstar_total_s"], "s")
EOF

# In-process runs skip the wrapper's durable row log; append this run's
# table so merge_benchmark_tables.py picks up the warm walls.
WARM_TABLE=$(ls -t logs/*_benchmark/table.txt 2>/dev/null | head -1)
python - "$WARM_TABLE" <<'EOF'
import json, sys
sys.path.insert(0, ".")
from scripts.merge_benchmark_tables import parse_table
with open("logs/benchmark_rows.jsonl", "a") as f:
    for r in parse_table(sys.argv[1]):
        f.write(json.dumps(r) + "\n")
EOF
