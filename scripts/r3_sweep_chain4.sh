#!/bin/bash
# Chain 4 (after chain 3): re-sweep the SumGAN/SumGAN_sup rows that ran
# BEFORE the resume_mid_fold=0 save policy landed (their walls carry
# ~4 min/fold of mid-fold state fetches through the 20 MB/s tunnel), then
# the warm north-star measurement, then the final table merge.
set -u
cd "$(dirname "$0")/.."

# Wait for chain 3 (owns /tmp/sweep_r3.pid) to finish.
while [ -f /tmp/sweep_r3.pid ] && kill -0 "$(cat /tmp/sweep_r3.pid)" 2>/dev/null; do
  sleep 60
done

echo $$ > /tmp/sweep_r3.pid
trap 'rm -f /tmp/sweep_r3.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

run_one() {  # model-name splits-file
  echo "=== $1 / $2"
  { time python -m summarizer_tpu.cli.benchmark --models "$1" -s "$2" \
      >> /tmp/r4_sweep.log 2>&1 ; } 2>&1
}

echo "=== [1/3] SumGAN re-rows under resume_mid_fold=0"
# Only the two SumGAN rows ran before the policy landed (chain 3's
# SumGAN_sup/SumGAN-att children spawned after it).  Clear just the
# tvsum/summe resume records so --resume re-measures instead of skipping
# (the LOL row's state and artifacts in the same dir stay); the old rows
# stay in benchmark_rows.jsonl until the merge replaces them.
rm -rf logs/bench_sumgan/state_tvsum_* logs/bench_sumgan/state_summe_* \
       logs/bench_sumgan/tvsum_splits.json.ckpt* \
       logs/bench_sumgan/summe_splits.json.ckpt*
run_one SumGAN     splits/tvsum_splits.json
run_one SumGAN     splits/summe_splits.json

echo "=== [2/3] warm north-star total (one bash time)"
bash scripts/northstar.sh 2>&1 | tee /tmp/r4_northstar_total.txt

echo "=== [3/3] merge"
python scripts/merge_benchmark_tables.py > /tmp/r4_merge.log 2>&1
tail -45 /tmp/r4_merge.log
echo "CHAIN4 DONE"
