#!/bin/bash
# Post-GAN-sweep chip work, run once the benchmark wrapper (pid in
# /tmp/benchmark.pid) exits:
#   1. merge the GAN rows with the supervised full-budget rows into
#      BENCHMARK_TABLE.txt
#   2. VASNet_loc on the 318-video LOL fixture (VERDICT round-1 item 10)
# Usage: bash scripts/post_sweep.sh  (blocks until the wrapper exits)
set -u
cd "$(dirname "$0")/.."

pid=$(cat /tmp/benchmark.pid 2>/dev/null || echo "")
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
  done
fi

latest_table=$(ls -t logs/*_benchmark/table.txt 2>/dev/null | head -1)
echo "=== merging $latest_table"
python scripts/merge_benchmark_tables.py "$latest_table"

echo "=== VASNet_loc on LOL-318"
/usr/bin/time -v python -m summarizer_tpu.cli.train -m vasnet \
  -s splits/LOL_splits.json -e 20 -t 2 -l info --no-tensorboard \
  --local 60 --log-dir logs/lol318_vasnet_loc 2>&1 |
  grep -viE "cpu_aot|SIGILL" | tail -25
