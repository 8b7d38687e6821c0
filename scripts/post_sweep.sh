#!/bin/bash
# Post-GAN-sweep chip work, run once the benchmark wrapper (pid in
# /tmp/benchmark.pid) exits:
#   1. timed re-sweep of the supervised/REINFORCE families (their rows
#      append to logs/benchmark_rows.jsonl like every sweep child's)
#   2. VASNet_loc on the 318-video LOL fixture (VERDICT round-1 item 10)
#   3. merge everything into BENCHMARK_TABLE.txt
# Usage: bash scripts/post_sweep.sh  (blocks until the wrapper exits)
set -u
cd "$(dirname "$0")/.."

pid=$(cat /tmp/benchmark.pid 2>/dev/null || echo "")
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
  done
fi

echo "=== timed supervised sweep (5 families + variants)"
/usr/bin/time -o /tmp/five_family_time.txt \
  python -m summarizer_tpu.cli.benchmark \
  --models random,logistic,vasnet,transformer,vslstm,dsn \
  > /tmp/benchmark_supervised2.log 2>&1
cat /tmp/five_family_time.txt

echo "=== VASNet on augmented cross-dataset splits (BASELINE config 3)"
python -m summarizer_tpu.cli.train -m vasnet \
  -s splits/tvsum_aug_splits.json,splits/summe_aug_splits.json \
  -e 20 -t 2 -l info --no-tensorboard --log-dir logs/vasnet_aug 2>&1 |
  grep -aviE "cpu_aot|SIGILL" | grep -aE "Cross-validation|Fold:" | tail -12

echo "=== VASNet_loc on LOL-318"
/usr/bin/time -o /tmp/lol318_time.txt python -m summarizer_tpu.cli.train \
  -m vasnet -s splits/LOL_splits.json -e 20 -t 2 -l info --no-tensorboard \
  --local 60 --log-dir logs/lol318_vasnet_loc 2>&1 |
  grep -aviE "cpu_aot|SIGILL" | tail -25
cat /tmp/lol318_time.txt

latest_table=$(ls -t logs/*_benchmark/table.txt 2>/dev/null | head -1)
echo "=== merging (latest table: $latest_table)"
python scripts/merge_benchmark_tables.py $latest_table
