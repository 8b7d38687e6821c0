#!/bin/bash
# Chain 3: the rows chain 2 did not finish, one (model, file) child at a
# time so completed rows are never re-bought.  Waits for the worker's BULK
# device_get path to be healthy first (the 12:00Z degradation killed six
# straight SumGAN/summe attempts at their first multi-GB state fetch).
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/sweep_r3.pid
trap 'rm -f /tmp/sweep_r3.pid' EXIT
TIMEFORMAT='CHAIN_TIME real %R s'

wait_for_bulk() {
  for i in $(seq 1 60); do
    if timeout 180 python -c "
import time, jax, jax.numpy as jnp, numpy as np
x = jnp.ones((64, 1024, 1024), jnp.float32)
x.block_until_ready()
t0 = time.time()
h = np.asarray(x)
print(f'bulk read {h.nbytes/1e6:.0f} MB in {time.time()-t0:.1f}s')" 2>&1 | grep "bulk read"; then
      echo "bulk-read probe $i ok"; return 0
    fi
    echo "bulk-read probe $i failed; waiting 120s"; sleep 120
  done
  return 1
}

run_one() {  # model-name splits-file
  echo "=== $1 / $2"
  { time python -m summarizer_tpu.cli.benchmark --models "$1" -s "$2" \
      >> /tmp/r3_sweep_gan2.log 2>&1 ; } 2>&1
}

wait_for_bulk

echo "=== [3b] remaining GAN rows (tvsum+summe)"
run_one SumGAN     splits/summe_splits.json
run_one SumGAN_sup splits/tvsum_splits.json
run_one SumGAN_sup splits/summe_splits.json
run_one SumGAN-att splits/tvsum_splits.json
run_one SumGAN-att splits/summe_splits.json

echo "=== [4b] Transformer-MoE (tvsum+summe)"
run_one transformer_moe splits/tvsum_splits.json
run_one transformer_moe splits/summe_splits.json

echo "=== [5b] LOL column (all 12 configs, planted-signal fixture)"
for m in Random "Logistic Regression" VASNet VASNet_loc Transformer \
         Transformer-MoE vsLSTM DSN DSN_sup SumGAN SumGAN_sup SumGAN-att; do
  run_one "$m" splits/LOL_splits.json
done

echo "=== [6b] merge"
python scripts/merge_benchmark_tables.py > /tmp/r3_merge.log 2>&1
tail -45 /tmp/r3_merge.log
echo "CHAIN DONE"
