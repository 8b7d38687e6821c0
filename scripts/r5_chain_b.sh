#!/bin/bash
# Round-5 block B — rebuild the summe/tvsum half of the benchmark grid on
# the CALIBRATED v2 fixtures (VERDICT r4 items 2+3), then re-measure the
# north star (item 4) and the per-family fold-parallel A/B (item 5).
#
# Pre-req (done by hand before launching): datasets regenerated with the
# v2 annotator profiles, EXPECTED_MD5 updated, pin test green, block A
# (GAN x LOL) finished so the chip is free.
#
# Blocks:
#   B1. cold sweep, supervised+REINFORCE+Human on summe+tvsum (subprocess
#       mode -> durable rows; also populates the AOT cache for B2)
#   B2. scripts/northstar.sh — the warm timed total (target < 300 s)
#   B3. vsLSTM + Transformer-MoE re-sweep (kills their pre-r4 tags)
#   B4. GAN fold-parallel probe, then the timed full-budget GAN sweep on
#       summe+tvsum through the chunked fold-parallel path (<45 min target)
#   B5. fold-parallel vs sequential A/B per family, with per-run CHAIN_RC
#       success markers (advisor r4 finding: a crashed run's small wall
#       must not flip the recommended default)
# A merge+commit runs after every block.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r5b.pid
trap 'rm -f /tmp/sweep_r5b.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

merge_and_commit() {
  python scripts/merge_benchmark_tables.py > /tmp/r5b_merge.log 2>&1
  if ! git diff --quiet -- BENCHMARK_TABLE.txt; then
    git add BENCHMARK_TABLE.txt logs/benchmark_rows.jsonl 2>/dev/null
    git commit -q -m "benchmark: $1" || true
  fi
}

echo "=== [B1] cold supervised sweep on v2 fixtures ($(date -u +%H:%M:%S))"
{ time python -m summarizer_tpu.cli.benchmark \
    --models random,logistic,vasnet,transformer,dsn,human \
    -s splits/summe_splits.json,splits/tvsum_splits.json \
    > /tmp/r5b_b1.log 2>&1 ; } 2>&1
merge_and_commit "supervised+Human rows on calibrated v2 fixtures"

echo "=== [B2] north-star timed warm run ($(date -u +%H:%M:%S))"
bash scripts/northstar.sh 2>&1 | tee /tmp/r5b_northstar.txt
merge_and_commit "north-star warm walls"

echo "=== [B4] GAN sweep: fold-parallel probe then timed full budget ($(date -u +%H:%M:%S))"
PROBE_LOG=/tmp/r5b_probe.log
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
{ time python -m summarizer_tpu.cli.benchmark --models sumgan,sumgan_att \
    -s splits/tvsum_splits.json,splits/summe_splits.json \
    ${FP_ARGS[@]+"${FP_ARGS[@]}"} \
    > /tmp/r5b_gan.log 2>&1 ; } 2>&1 | tee /tmp/r5b_gan_total.txt
cp /tmp/r5b_gan_total.txt logs/gan_total.txt
merge_and_commit "GAN rows (full budget, timed) on v2 fixtures"

echo "=== [B3] vsLSTM + Transformer-MoE re-sweep ($(date -u +%H:%M:%S))"
{ time python -m summarizer_tpu.cli.benchmark --models vslstm,transformer_moe \
    -s splits/summe_splits.json,splits/tvsum_splits.json \
    > /tmp/r5b_b3.log 2>&1 ; } 2>&1
merge_and_commit "vsLSTM + Transformer-MoE rows on v2 fixtures"

echo "=== [B5] fold-parallel vs sequential A/B ($(date -u +%H:%M:%S))"
AB=logs/ab_foldparallel.txt
: > "$AB"
for m in "Logistic Regression" VASNet VASNet_loc vsLSTM DSN DSN_sup; do
  for fp in 1 0; do
    echo "--- $m fold_parallel=$fp" | tee -a "$AB"
    # time's report goes straight into $AB; $? is python's exit status
    # (NOT a pipeline's last-command status — advisor r4 finding).
    { time python -m summarizer_tpu.cli.benchmark --models "$m" \
        -s splits/tvsum_splits.json --in-process \
        --set fold_parallel=$fp > /tmp/r5b_ab.log 2>&1 ; } 2>> "$AB"
    rc=$?
    if [ $rc -eq 0 ] && grep -q "Table saved" /tmp/r5b_ab.log; then
      echo "CHAIN_RC 0" | tee -a "$AB"
    else
      echo "CHAIN_RC $([ $rc -eq 0 ] && echo 1 || echo $rc)" | tee -a "$AB"
    fi
    tail -n 2 "$AB"
  done
done
python scripts/summarize_ab.py "$AB" | tee logs/ab_foldparallel_summary.txt
# logs/ is gitignored: -f the small round artifacts so they survive a VM
# recycle (round 4 lost logs/northstar.json this way).
git add -f "$AB" logs/ab_foldparallel_summary.txt logs/gan_total.txt \
    logs/northstar.json 2>/dev/null
git add NORTHSTAR.json 2>/dev/null
git commit -q -m "round 5: A/B + GAN sweep total + north-star artifacts" || true
echo "CHAIN R5B DONE ($(date -u +%H:%M:%S))"
