#!/bin/bash
# Round-4 chain (VERDICT r3 items 1+3), highest-value artifacts first:
#   0. warm pass over the 5 reference families (populates/refreshes the AOT
#      cache so block 1 times re-run wall, not compile wall) — also re-lands
#      the tvsum/summe supervised rows WITH fixture fingerprints
#   1. north-star total: ONE bash time around the warm 5-family sweep
#      -> logs/northstar.json
#   2. LOL column on the planted-signal fixture, separation-establishing
#      families first (Random ~0 vs Logistic/VASNet_loc clearly positive)
#   3. the 3 GAN x LOL rows at the DATASET_OVERRIDES budgets
# A merge runs after every block so BENCHMARK_TABLE.txt is always current.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r4.pid
trap 'rm -f /tmp/sweep_r4.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

run_one() {  # model-name splits-file
  echo "=== $1 / $2  ($(date -u +%H:%M:%S))"
  { time python -m summarizer_tpu.cli.benchmark --models "$1" -s "$2" \
      >> /tmp/r4_sweep.log 2>&1 ; } 2>&1
}
merge() { python scripts/merge_benchmark_tables.py > /tmp/r4_merge.log 2>&1; }

echo "=== [0/3] warm pass (reference families, tvsum+summe)"
python -m summarizer_tpu.cli.benchmark \
  --models random,logistic,vasnet,transformer,dsn --in-process \
  > /tmp/r4_warm.log 2>&1
merge

echo "=== [1/3] north-star total (one bash time, warm)"
bash scripts/northstar.sh 2>&1 | tee /tmp/r4_northstar_total.txt
merge

echo "=== [2/3] LOL column (planted-signal fixture)"
for m in Random "Logistic Regression" VASNet_loc VASNet vsLSTM DSN DSN_sup \
         Transformer Transformer-MoE; do
  run_one "$m" splits/LOL_splits.json
  merge
done

echo "=== [3/3] GAN x LOL rows"
for m in SumGAN SumGAN_sup SumGAN-att; do
  run_one "$m" splits/LOL_splits.json
  merge
done
tail -50 /tmp/r4_merge.log
echo "CHAIN4 DONE"
