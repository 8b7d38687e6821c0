#!/bin/bash
# Round-3 definitive benchmark re-sweep (VERDICT r2 items 1, 4, 7):
#
#   1. COLD full sweep of the 6 supervised/REINFORCE families (8 configs) on
#      tvsum+summe with the round-3 engine defaults (fused fold-parallel CV,
#      scanned transformer stack) — populates .jax_cache and the quality rows.
#   2. WARM in-process timed re-run of the same 8 configs: the north-star
#      wall-clock measurement ("6 families < 5 min total on one chip").
#   3. GAN configs (SumGAN, SumGAN_sup, SumGAN-att) on both datasets at the
#      int8/group-20/remat-0 sweep defaults — target < 30 min total.
#   4. Transformer-MoE (extra family, not part of the north-star 5).
#   5. LOL column for ALL 12 configs on the regenerated planted-signal
#      fixture (fills the 3 GAN x LOL cells; re-measures the rest so the
#      quality column regresses signal recovery, not just scale).
#   6. Merge everything into BENCHMARK_TABLE.txt.
#
# Exactly one child owns the TPU at any time.  bench.py's _stop_sweeps can
# evict us at round end via /tmp/sweep*.pid (children register their own
# /tmp/benchmark_*.pid too and forward SIGTERM).
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r3.pid
trap 'rm -f /tmp/sweep_r3.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

# Serialize with any pytest run holding the single CPU core.
if [ -f /tmp/pytest.pid ]; then
  while kill -0 "$(cat /tmp/pytest.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done
fi

# Fresh-sweep hygiene: round-2 resume states were trained under different
# configs (resume_light, group 8, old LOL fixture) — a resumed fold would
# mix dynamics.  The durable row log is rotated so the merge can't pick up
# stale rows for (model, file) pairs this sweep re-measures.
mv logs/benchmark_rows.jsonl logs/benchmark_rows_r2.jsonl.bak 2>/dev/null || true
rm -f /tmp/benchmark_full.log
for d in logs/bench_*; do [ -d "$d" ] && mv "$d" "${d}_r2bak"; done 2>/dev/null

SUP=random,logistic,vasnet,transformer,vslstm,dsn

echo "=== [1/6] cold supervised sweep (tvsum+summe)"
{ time python -m summarizer_tpu.cli.benchmark --models $SUP \
    > /tmp/r3_sweep_sup.log 2>&1 ; } 2>&1
tail -3 /tmp/r3_sweep_sup.log

echo "=== [2/6] WARM north-star run (in-process, 8 configs x 2 files)"
# Clear fold states so training actually re-runs; .jax_cache stays warm.
for d in logs/bench_*; do case "$d" in *_r2bak) ;; *) rm -rf "$d";; esac; done
{ time python -m summarizer_tpu.cli.benchmark --models $SUP --in-process \
    > /tmp/r3_northstar.log 2>&1 ; } 2> /tmp/r3_northstar_time.txt
cat /tmp/r3_northstar_time.txt
grep -aE "File: " /tmp/r3_northstar.log | tail -16
WARM_TABLE=$(ls -t logs/*_benchmark/table.txt 2>/dev/null | head -1)
# The in-process run bypasses the durable row log; append its rows (warm
# steady-state walls — the ones the final table should carry for the
# supervised families) so the merge prefers them over the cold pass.
python - "$WARM_TABLE" <<'EOF'
import json, sys
sys.path.insert(0, ".")
from scripts.merge_benchmark_tables import parse_table
with open("logs/benchmark_rows.jsonl", "a") as f:
    for r in parse_table(sys.argv[1]):
        f.write(json.dumps(r) + "\n")
EOF

echo "=== [3/6] GAN sweep (tvsum+summe)"
{ time python -m summarizer_tpu.cli.benchmark --models sumgan,sumgan_att \
    > /tmp/r3_sweep_gan.log 2>&1 ; } 2>&1
tail -3 /tmp/r3_sweep_gan.log

echo "=== [4/6] Transformer-MoE (tvsum+summe)"
{ time python -m summarizer_tpu.cli.benchmark --models transformer_moe \
    > /tmp/r3_sweep_moe.log 2>&1 ; } 2>&1

echo "=== [5/6] LOL column (all 12 configs, planted-signal fixture)"
{ time python -m summarizer_tpu.cli.benchmark \
    --models $SUP,transformer_moe,sumgan,sumgan_att \
    -s splits/LOL_splits.json \
    > /tmp/r3_sweep_lol.log 2>&1 ; } 2>&1
tail -3 /tmp/r3_sweep_lol.log

echo "=== [6/6] merge"
python scripts/merge_benchmark_tables.py > /tmp/r3_merge.log 2>&1
tail -45 /tmp/r3_merge.log
echo "CHAIN DONE"
