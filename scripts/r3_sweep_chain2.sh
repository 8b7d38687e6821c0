#!/bin/bash
# Continuation of scripts/r3_sweep_chain.sh after a TPU-worker wedge killed
# the (watchdog-less) in-process warm run: steps 2-6, with the warm
# north-star measurement wrapped in timeout+retry so a dead-worker RPC hang
# costs 20 min, not the chain.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r3.pid
trap 'rm -f /tmp/sweep_r3.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

SUP=random,logistic,vasnet,transformer,vslstm,dsn

wait_for_worker() {
  for i in $(seq 1 40); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))" >/dev/null 2>&1; then
      echo "worker healthy (probe $i)"; return 0
    fi
    echo "worker probe $i failed; waiting 60s"; sleep 60
  done
  return 1
}

echo "=== [2/6] WARM north-star run (in-process, 8 configs x 2 files)"
wait_for_worker
for attempt in 1 2 3; do
  for d in logs/bench_*; do case "$d" in *_r2bak) ;; *) rm -rf "$d";; esac; done
  { time timeout 1500 python -m summarizer_tpu.cli.benchmark --models $SUP \
      --in-process > /tmp/r3_northstar.log 2>&1 ; } 2> /tmp/r3_northstar_time.txt
  rc=$?
  cat /tmp/r3_northstar_time.txt
  if [ $rc -eq 0 ]; then break; fi
  echo "warm run attempt $attempt failed (rc=$rc); resetting"
  wait_for_worker
done
grep -aE "File: " /tmp/r3_northstar.log | tail -16
WARM_TABLE=$(ls -t logs/*_benchmark/table.txt 2>/dev/null | head -1)
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
