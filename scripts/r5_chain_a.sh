#!/bin/bash
# Round-5 block A — land the 3 GAN x LOL table rows (VERDICT r4 item 1).
# Resumes the round-4 chain's on-disk state: SumGAN_sup LOL folds 0-2 are
# checkpointed in logs/bench_sumgan_sup (fold3 mid-flight), SumGAN and
# SumGAN-att have not started.  Each family gets up to 3 OUTER launches
# (each launch has the wrapper's own 8 resume-attempts inside), a merge
# runs after every family, and the updated table is committed so a VM
# recycle can never lose a landed row again.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r5a.pid
trap 'rm -f /tmp/sweep_r5a.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

merge_and_commit() {
  python scripts/merge_benchmark_tables.py > /tmp/r5a_merge.log 2>&1
  if ! git diff --quiet -- BENCHMARK_TABLE.txt; then
    git add BENCHMARK_TABLE.txt logs/benchmark_rows.jsonl 2>/dev/null
    git commit -q -m "benchmark: $1" || true
  fi
}

row_landed() {  # row_landed <Model> <splits-file-substring>
  [ -f logs/benchmark_rows.jsonl ] && \
    python - "$1" "$2" <<'EOF'
import json, sys
model, sf = sys.argv[1], sys.argv[2]
ok = any(r[0] == model and sf in r[1] and r[2] == r[2]
         for r in map(json.loads, open("logs/benchmark_rows.jsonl")))
sys.exit(0 if ok else 1)
EOF
}

echo "=== [A] GAN x LOL rows ($(date -u +%H:%M:%S))"
for m in SumGAN_sup SumGAN SumGAN-att; do
  for outer in 1 2 3; do
    if row_landed "$m" "LOL"; then break; fi
    echo "--- $m / LOL outer attempt $outer ($(date -u +%H:%M:%S))"
    { time python -m summarizer_tpu.cli.benchmark --models "$m" \
        -s splits/LOL_splits.json >> /tmp/r5a_sweep.log 2>&1 ; } 2>&1
  done
  if row_landed "$m" "LOL"; then
    merge_and_commit "$m LOL row landed"
    echo "+++ $m / LOL LANDED ($(date -u +%H:%M:%S))"
  else
    echo "!!! $m / LOL FAILED after 3 outer attempts"
  fi
done
echo "CHAIN R5A DONE ($(date -u +%H:%M:%S))"
