#!/bin/bash
# Waits for the r5a chain (GAN x LOL) to finish, then launches chain B.
set -u
cd "$(dirname "$0")/.."
while [ -f /tmp/sweep_r5a.pid ] && kill -0 "$(cat /tmp/sweep_r5a.pid)" 2>/dev/null; do
  sleep 60
done
echo "chain A finished at $(date -u +%H:%M:%S); launching chain B"
exec bash scripts/r5_chain_b.sh
