#!/bin/bash
# Chain 5: remaining round-3 rows, reordered so the highest-value artifacts
# land first if the round is cut short:
#   1. GAN tvsum/summe rows (VERDICT items 1/4)
#   2. LOL column on the planted-signal fixture (item 7 + Table-1 shape),
#      separation-establishing families first
#   3. SumGAN re-rows under resume_mid_fold=0 (clean walls)
#   4. north-star total + merge
# A merge runs after every block so BENCHMARK_TABLE.txt is always current.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r3.pid
trap 'rm -f /tmp/sweep_r3.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

# Wait for the orphaned SumGAN_sup/tvsum wrapper from the previous chain to
# release the TPU (liveness check only — nothing is signalled by pattern).
while pgrep -f "cli.benchmark --models SumGAN_sup -s splits/tvsum" > /dev/null 2>&1; do
  sleep 60
done

run_one() {  # model-name splits-file
  echo "=== $1 / $2  ($(date -u +%H:%M:%S))"
  { time python -m summarizer_tpu.cli.benchmark --models "$1" -s "$2" \
      >> /tmp/r5_sweep.log 2>&1 ; } 2>&1
}
merge() { python scripts/merge_benchmark_tables.py > /tmp/r5_merge.log 2>&1; }

echo "=== [1/4] remaining GAN rows"
run_one SumGAN_sup splits/summe_splits.json
run_one SumGAN-att splits/tvsum_splits.json
run_one SumGAN-att splits/summe_splits.json
merge

echo "=== [2/4] LOL column (planted-signal fixture)"
for m in Random "Logistic Regression" VASNet_loc VASNet vsLSTM DSN DSN_sup \
         Transformer SumGAN SumGAN_sup SumGAN-att Transformer-MoE; do
  run_one "$m" splits/LOL_splits.json
done
merge

echo "=== [3/4] SumGAN re-rows under resume_mid_fold=0"
rm -rf logs/bench_sumgan/state_tvsum_* logs/bench_sumgan/state_summe_* \
       logs/bench_sumgan/tvsum_splits.json.ckpt* \
       logs/bench_sumgan/summe_splits.json.ckpt*
run_one SumGAN splits/tvsum_splits.json
run_one SumGAN splits/summe_splits.json
merge

echo "=== [4/4] warm north-star total (one bash time)"
bash scripts/northstar.sh 2>&1 | tee /tmp/r5_northstar_total.txt
merge
tail -45 /tmp/r5_merge.log
echo "CHAIN5 DONE"
