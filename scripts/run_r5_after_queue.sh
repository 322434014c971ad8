#!/bin/sh
# Round-5 chip chain, part 2: once run_round5_queue.sh releases the chip,
# run the stream-offset diagnostic (VERDICT round-4 task 5) — the validate
# protocol on the bench shapes decides population-vs-protocol for the
# 5.5pt seg-IoU offset. Self-banking (queue_lib contract).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

step "waiting for round-5 queue completion"
while ! grep -q "round-5 queue complete\|ABORT" logs/r5_queue.log 2>/dev/null; do
  sleep 60
done
step "chip free — offset diagnostic"

if [ ! -s artifacts/r5_offset_diag.json ]; then
  # the standard arm re-measures the seed-2 slice in the same process so
  # both numbers share one code state; exact kNN pins the r4 A/B setting
  timeout 10800 python scripts/diag_stream_offset.py --num-shapes 24 \
    --knn exact > logs/r5_offset_diag.log 2>&1 \
    || step "offset diag FAILED rc=$?"
fi

. "$(dirname "$0")/queue_lib.sh"
bank artifacts/r5_offset_diag.json logs/r5_offset_diag.log || true
step "after-queue chain complete"
