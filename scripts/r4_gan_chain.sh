#!/bin/bash
# Round-4 chain 2 (VERDICT r3 items 1-remainder, 2, 4):
#   A. the remaining GAN x LOL rows (SumGAN_sup, SumGAN-att) at the
#      bf16-pack/batch-8 budgets (SumGAN LOL runs separately before this)
#   B. chunked fold-parallel probe for SumGAN (tvsum, 2 epochs): does the
#      2-fold stack fit HBM and beat sequential per-epoch?
#   C. if the probe passes: timed full-budget GAN re-sweep (all 3 families,
#      summe+tvsum) through fold-parallel -> logs/gan_total.txt; else the
#      same timed sweep sequential (still a citable total).
#   D. fold-parallel vs sequential A/B per small family (warm, tvsum)
#      -> logs/ab_foldparallel.txt
# A merge runs after every block so BENCHMARK_TABLE.txt is always current.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r4b.pid
trap 'rm -f /tmp/sweep_r4b.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

merge() { python scripts/merge_benchmark_tables.py > /tmp/r4b_merge.log 2>&1; }

echo "=== [A] GAN x LOL rows ($(date -u +%H:%M:%S))"
for m in SumGAN SumGAN_sup SumGAN-att; do
  echo "--- $m / LOL"
  { time python -m summarizer_tpu.cli.benchmark --models "$m" \
      -s splits/LOL_splits.json >> /tmp/r4b_sweep.log 2>&1 ; } 2>&1
  merge
done

echo "=== [B] SumGAN chunked fold-parallel probe (tvsum, 2 epochs)"
# Two-stage: a 2-fold stack doubles the phase activations, so try the fast
# no-remat int8 shape first, fall back to remat (bounded residuals, ~-25%
# throughput), else sequential.
PROBE_LOG=/tmp/r4b_probe.log
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

echo "=== [C] timed full-budget GAN sweep (summe+tvsum)"
{ time python -m summarizer_tpu.cli.benchmark --models sumgan,sumgan_att \
    -s splits/tvsum_splits.json,splits/summe_splits.json "${FP_ARGS[@]}" \
    > /tmp/r4b_gan.log 2>&1 ; } 2>&1 | tee /tmp/r4b_gan_total.txt
cp /tmp/r4b_gan_total.txt logs/gan_total.txt
merge

echo "=== [D] fold-parallel vs sequential A/B (warm, tvsum)"
AB=logs/ab_foldparallel.txt
: > "$AB"
for m in "Logistic Regression" VASNet VASNet_loc vsLSTM DSN DSN_sup; do
  for fp in 1 0; do
    echo "--- $m fold_parallel=$fp" | tee -a "$AB"
    { time python -m summarizer_tpu.cli.benchmark --models "$m" \
        -s splits/tvsum_splits.json --in-process \
        --set fold_parallel=$fp > /tmp/r4b_ab.log 2>&1 ; } 2>&1 | tee -a "$AB"
  done
done
merge

echo "=== [E] re-fingerprint remaining pre-r4 supervised rows (vsLSTM, MoE)"
for m in vsLSTM Transformer-MoE; do
  echo "--- $m / summe+tvsum"
  { time python -m summarizer_tpu.cli.benchmark --models "$m" \
      -s splits/tvsum_splits.json,splits/summe_splits.json \
      >> /tmp/r4b_sweep.log 2>&1 ; } 2>&1
  merge
done
echo "CHAIN R4B DONE"

echo "=== [F] SumGAN x LOL retry (fresh 8-attempt budget, guards + resume in place)"
{ time python -m summarizer_tpu.cli.benchmark --models SumGAN \
    -s splits/LOL_splits.json >> /tmp/r4b_sweep.log 2>&1 ; } 2>&1
merge
echo "CHAIN R4B DONE (incl. F)"
