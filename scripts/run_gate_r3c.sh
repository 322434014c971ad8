#!/bin/sh
# Gate runner for the round-3c 12-epoch continuation fine-tune.
#
# Waits for the fine-tune process to exit, exports the best-val checkpoint
# (logs/checkpoints/parsenet_e2e_ft) to a CANDIDATE npz under logs/ (NOT
# params/ — the shipping rule in RESULTS.md), then runs the full 10k-point
# bench gate against it. Promotion to params/ stays a manual step: green
# floors AND headline quality >= the shipped export.
#
# Usage: setsid nohup sh scripts/run_gate_r3c.sh <finetune_pid> \
#          > logs/gate_r3c.log 2>&1 < /dev/null &
set -u
FT_PID="${1:?usage: run_gate_r3c.sh <finetune_pid>}"
cd "$(dirname "$0")/.."

# PID-reuse-safe wait: stop as soon as the pid is gone OR no longer the
# fine-tune (a recycled pid must not park the gate forever). Superseded by
# the marker-file pattern in run_round4_queue.sh for new work.
while kill -0 "$FT_PID" 2>/dev/null \
      && grep -q finetune_e2e "/proc/$FT_PID/cmdline" 2>/dev/null; do
  sleep 20
done
echo "gate: fine-tune pid $FT_PID exited at $(date -u +%H:%M:%S)"

env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/export_params.py --e2e-ckpt parsenet_e2e_ft \
    --e2e-out logs/cand_e2e_r3c.npz || exit 1

echo "gate: running 10k bench gate on the candidate"
JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
    BENCH_PARAMS=logs/cand_e2e_r3c.npz \
    python bench.py > logs/gate_r3c.json 2> logs/gate_r3c.err
rc=$?
echo "gate: bench rc=$rc"
cat logs/gate_r3c.json
# bank terminal artifacts into committed artifacts/ (queue_lib contract)
. "$(dirname "$0")/queue_lib.sh"
bank logs/gate_r3c.json
exit $rc
