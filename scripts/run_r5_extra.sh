#!/bin/sh
# Round-5 chip chain, part 3: after the offset diagnostic releases the chip
# (run_r5_after_queue.sh), measure the non-MXU primitives the roofline
# attributes the DGCNN gap to (scripts/probe_topk_gather.py): approx_max_k
# at both recalls vs exact top_k, the fused kNN chunk body, and the
# neighbour gather — all at production dims on the real chip. Cheap
# (single-op compiles, ~10 min total) and self-banking (queue_lib contract).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

step "waiting for after-queue chain completion"
while ! grep -q "after-queue chain complete" logs/r5_after_queue.log 2>/dev/null; do
  sleep 60
done
step "chip free — top-k/gather probe"

if [ ! -s artifacts/r5_topk_probe.json ]; then
  timeout 3600 python scripts/probe_topk_gather.py \
    --out artifacts/r5_topk_probe.json \
    > logs/r5_topk_probe.log 2>&1 || step "probe FAILED rc=$?"
fi

. "$(dirname "$0")/queue_lib.sh"
bank artifacts/r5_topk_probe.json logs/r5_topk_probe.log || true
step "extra chain complete"
