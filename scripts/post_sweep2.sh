#!/bin/bash
# Repair pass for post_sweep.sh: that script's timed steps used
# /usr/bin/time, which doesn't exist in this image, so the supervised
# re-sweep and the LOL-318 run exited at launch.  This one waits for the
# post_sweep wrapper to exit, then runs the two missing steps with bash's
# builtin `time` and re-merges the table.
set -u
cd "$(dirname "$0")/.."

pid=$(cat /tmp/post_sweep.pid 2>/dev/null || echo "")
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
  done
fi

echo "=== timed supervised sweep (5 families + variants)"
TIMEFORMAT='real %R s'
{ time python -m summarizer_tpu.cli.benchmark \
    --models random,logistic,vasnet,transformer,vslstm,dsn \
    > /tmp/benchmark_supervised2.log 2>&1 ; } 2> /tmp/five_family_time.txt
cat /tmp/five_family_time.txt

echo "=== VASNet_loc on LOL-318"
{ time python -m summarizer_tpu.cli.train \
    -m vasnet -s splits/LOL_splits.json -e 20 -t 2 -l info --no-tensorboard \
    --local 60 --log-dir logs/lol318_vasnet_loc > /tmp/lol318.log 2>&1 ; } \
    2> /tmp/lol318_time.txt
grep -aE "Cross-validation|Fold:" /tmp/lol318.log | tail -8
cat /tmp/lol318_time.txt

latest_table=$(ls -t logs/*_benchmark/table.txt 2>/dev/null | head -1)
echo "=== merging (latest table: $latest_table)"
python scripts/merge_benchmark_tables.py $latest_table
