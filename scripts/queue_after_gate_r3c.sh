#!/bin/sh
# Chains the 3-arm kNN-recall A/B (RESULTS.md's last open measurement) behind
# the round-3c bench gate so the single TPU chip is never contended: waits
# for the gate runner to exit, then runs scripts/ab_knn_recall.py over the
# shipped checkpoint with incremental JSON (resumable after a relay wedge).
#
# Usage: setsid nohup sh scripts/queue_after_gate_r3c.sh <gate_runner_pid> \
#          > logs/ab_knn_r3c.log 2>&1 < /dev/null &
set -u
GATE_PID="${1:?usage: queue_after_gate_r3c.sh <gate_runner_pid>}"
cd "$(dirname "$0")/.."

# PID-reuse-safe wait (see run_gate_r3c.sh); superseded by the marker-file
# pattern in run_round4_queue.sh for new work.
while kill -0 "$GATE_PID" 2>/dev/null \
      && grep -q run_gate_r3c "/proc/$GATE_PID/cmdline" 2>/dev/null; do
  sleep 30
done
echo "ab: gate runner $GATE_PID exited at $(date -u +%H:%M:%S)"

JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
    python scripts/ab_knn_recall.py --num-shapes 24 \
    --json-out logs/ab_knn_r3c.json --timeout 3000
rc=$?
echo "ab: rc=$rc"
exit $rc
