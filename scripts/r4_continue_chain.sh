#!/bin/bash
# Round-4 chain 3b — continuation after SumGAN_sup/LOL, reordered so the
# cheapest remaining artifacts land first if the session truncates:
#   A2. SumGAN-att / LOL   (fastest remaining GAN x LOL cell)
#   D.  fold-parallel vs sequential A/B (VERDICT r3 item 4, ~25 min)
#   A3. SumGAN / LOL       (slowest cell)
#   B.  SumGAN chunked fold-parallel probe (tvsum, 2 epochs)
#   C.  timed full-budget GAN sweep summe+tvsum -> logs/gan_total.txt
#   E.  re-fingerprint pre-r4 supervised rows (vsLSTM, MoE)
# A merge runs after every block so BENCHMARK_TABLE.txt is always current.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r4d.pid
trap 'rm -f /tmp/sweep_r4d.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

merge() { python scripts/merge_benchmark_tables.py > /tmp/r4d_merge.log 2>&1; }

echo "=== [A2] SumGAN-att / LOL ($(date -u +%H:%M:%S))"
{ time python -m summarizer_tpu.cli.benchmark --models SumGAN-att \
    -s splits/LOL_splits.json >> /tmp/r4d_sweep.log 2>&1 ; } 2>&1
merge

echo "=== [D] fold-parallel vs sequential A/B (warm, tvsum, $(date -u +%H:%M:%S))"
AB=logs/ab_foldparallel.txt
: > "$AB"
for m in "Logistic Regression" VASNet VASNet_loc vsLSTM DSN DSN_sup; do
  for fp in 1 0; do
    echo "--- $m fold_parallel=$fp" | tee -a "$AB"
    { time python -m summarizer_tpu.cli.benchmark --models "$m" \
        -s splits/tvsum_splits.json --in-process \
        --set fold_parallel=$fp > /tmp/r4d_ab.log 2>&1 ; } 2>&1 | tee -a "$AB"
  done
done
python scripts/summarize_ab.py "$AB" | tee -a "$AB"
merge

echo "=== [A3] SumGAN / LOL ($(date -u +%H:%M:%S))"
{ time python -m summarizer_tpu.cli.benchmark --models SumGAN \
    -s splits/LOL_splits.json >> /tmp/r4d_sweep.log 2>&1 ; } 2>&1
merge

echo "=== [B] SumGAN chunked fold-parallel probe (tvsum, 2 epochs, $(date -u +%H:%M:%S))"
PROBE_LOG=/tmp/r4d_probe.log
FP_ARGS=()
for extra in "" "--set remat=1"; do
  # shellcheck disable=SC2086
  { time python -m summarizer_tpu.cli.benchmark --models SumGAN \
      -s splits/tvsum_splits.json --in-process -e 2 \
      --set fold_parallel=1 --set fold_parallel_hbm_gb=5 $extra \
      > "$PROBE_LOG" 2>&1 ; } 2>&1
  rc=$?
  if [ $rc -eq 0 ] && grep -q "Table saved" "$PROBE_LOG" \
      && ! grep -q "RESOURCE_EXHAUSTED" "$PROBE_LOG"; then
    echo "PROBE OK (extra='$extra') — fold-parallel GAN re-sweep"
    # shellcheck disable=SC2206
    FP_ARGS=(--set fold_parallel=1 --set fold_parallel_hbm_gb=5 $extra)
    break
  fi
  echo "probe variant failed (rc=$rc, extra='$extra'), trying next"
done
[ ${#FP_ARGS[@]} -eq 0 ] && echo "PROBE FAILED — sequential timed sweep"

echo "=== [C] timed full-budget GAN sweep (summe+tvsum, $(date -u +%H:%M:%S))"
{ time python -m summarizer_tpu.cli.benchmark --models sumgan,sumgan_att \
    -s splits/tvsum_splits.json,splits/summe_splits.json "${FP_ARGS[@]}" \
    > /tmp/r4d_gan.log 2>&1 ; } 2>&1 | tee /tmp/r4d_gan_total.txt
cp /tmp/r4d_gan_total.txt logs/gan_total.txt
merge

echo "=== [E] re-fingerprint remaining pre-r4 supervised rows (vsLSTM, MoE, $(date -u +%H:%M:%S))"
for m in vsLSTM Transformer-MoE; do
  echo "--- $m / summe+tvsum"
  { time python -m summarizer_tpu.cli.benchmark --models "$m" \
      -s splits/tvsum_splits.json,splits/summe_splits.json \
      >> /tmp/r4d_sweep.log 2>&1 ; } 2>&1
  merge
done
echo "CHAIN R4D DONE ($(date -u +%H:%M:%S))"
