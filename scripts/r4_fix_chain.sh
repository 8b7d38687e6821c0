#!/bin/bash
# Round-4 chain 3 — relaunch of r4_gan_chain.sh after the OOM fixes
# (phase-step donation, lazy eval gather, bucket_quantum=1024; commit
# ef40cfb).  Blocks:
#   A. GAN x LOL rows: SumGAN_sup first (resumes its e0 post-pretrain
#      checkpoint), then SumGAN, then SumGAN-att.
#   B. SumGAN chunked fold-parallel probe (tvsum, 2 epochs).
#   C. timed full-budget GAN sweep (summe+tvsum), fold-parallel if the
#      probe passed -> logs/gan_total.txt  (also refreshes the pre-r4
#      SumGAN/SumGAN_sup/SumGAN-att summe+tvsum fingerprints).
#   D. fold-parallel vs sequential A/B per small family (warm, tvsum).
#   E. re-fingerprint remaining pre-r4 supervised rows (vsLSTM, MoE).
# A merge runs after every block so BENCHMARK_TABLE.txt is always current.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r4c.pid
trap 'rm -f /tmp/sweep_r4c.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

merge() { python scripts/merge_benchmark_tables.py > /tmp/r4c_merge.log 2>&1; }

echo "=== [A] GAN x LOL rows ($(date -u +%H:%M:%S))"
for m in SumGAN_sup SumGAN SumGAN-att; do
  echo "--- $m / LOL ($(date -u +%H:%M:%S))"
  { time python -m summarizer_tpu.cli.benchmark --models "$m" \
      -s splits/LOL_splits.json >> /tmp/r4c_sweep.log 2>&1 ; } 2>&1
  merge
done

echo "=== [B] SumGAN chunked fold-parallel probe (tvsum, 2 epochs, $(date -u +%H:%M:%S))"
PROBE_LOG=/tmp/r4c_probe.log
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
    > /tmp/r4c_gan.log 2>&1 ; } 2>&1 | tee /tmp/r4c_gan_total.txt
cp /tmp/r4c_gan_total.txt logs/gan_total.txt
merge

echo "=== [D] fold-parallel vs sequential A/B (warm, tvsum, $(date -u +%H:%M:%S))"
AB=logs/ab_foldparallel.txt
: > "$AB"
for m in "Logistic Regression" VASNet VASNet_loc vsLSTM DSN DSN_sup; do
  for fp in 1 0; do
    echo "--- $m fold_parallel=$fp" | tee -a "$AB"
    { time python -m summarizer_tpu.cli.benchmark --models "$m" \
        -s splits/tvsum_splits.json --in-process \
        --set fold_parallel=$fp > /tmp/r4c_ab.log 2>&1 ; } 2>&1 | tee -a "$AB"
  done
done
merge

echo "=== [E] re-fingerprint remaining pre-r4 supervised rows (vsLSTM, MoE, $(date -u +%H:%M:%S))"
for m in vsLSTM Transformer-MoE; do
  echo "--- $m / summe+tvsum"
  { time python -m summarizer_tpu.cli.benchmark --models "$m" \
      -s splits/tvsum_splits.json,splits/summe_splits.json \
      >> /tmp/r4c_sweep.log 2>&1 ; } 2>&1
  merge
done
echo "CHAIN R4C DONE ($(date -u +%H:%M:%S))"
