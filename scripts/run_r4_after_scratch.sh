#!/bin/sh
# Round-4 chip chain, part 2 (VERDICT round-3 task 6): once the from-scratch
# queue (run_round4_scratch.sh) releases the chip, measure the e2e train
# step's in-context ablation sweep — 8 jitted-graph variants that localize
# where the ~200 ms step goes — then the seg/e2e A/B arms that the sweep
# motivates (ms_samples at run_training's actual 2048, bf16 net, remat).
# Everything appends one JSON line per arm to logs/r4_train_ablate.jsonl;
# BENCH_TRAIN_r04.json is assembled manually after the speedup decision.
#
# Waits on the QUEUE COMPLETION LINE in logs/r4s_queue.log (marker-file
# pattern, not PID-watching — ADVICE round 3).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
OUT=logs/r4_train_ablate.jsonl
step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

step "waiting for scratch queue completion"
while ! grep -q "scratch queue complete\|FAILED\|ABORT" logs/r4s_queue.log \
        2>/dev/null; do
  sleep 60
done
# a FAILED/ABORT queue has also released the chip — proceed, the sweep is
# independent of the scratch candidate
step "chip free ($(grep -c FAILED logs/r4s_queue.log 2>/dev/null || echo 0) FAILED lines) — ablation sweep"

arm() { # arm <label> <env...>
  label="$1"; shift
  # resume-skip only on a SUCCESSFUL record: an {"arm": ..., "error": rc}
  # line means the arm failed (possibly transiently — relay wedge, the
  # exact failure mode this queue is built around) and must be retried
  if grep -q "\"arm\": \"$label\", \"result\"" "$OUT" 2>/dev/null; then
    step "skip arm $label"; return 0; fi
  step "arm $label: start"
  out=$(timeout 3000 env "$@" python scripts/bench_train.py e2e 2>logs/r4_arm_"$label".err)
  rc=$?
  line=$(echo "$out" | grep '^{' | tail -1)
  if [ "$rc" -eq 0 ] && [ -n "$line" ]; then
    echo "{\"arm\": \"$label\", \"result\": $line}" >> "$OUT"
    step "arm $label: $line"
  else
    echo "{\"arm\": \"$label\", \"error\": $rc}" >> "$OUT"
    step "arm $label FAILED rc=$rc"
  fi
}

# 1: the full in-context ablation sweep (one process, 8 graph variants)
if grep -q '"e2e_ablation_ms"' logs/r4_e2e_ablate.log 2>/dev/null; then
  step "skip ablation sweep"
else
  step "ablation sweep: start"
  timeout 9000 python scripts/bench_train.py e2e_ablate \
    > logs/r4_e2e_ablate.log 2> logs/r4_e2e_ablate.err
  step "ablation sweep: rc=$? (logs/r4_e2e_ablate.log)"
fi

# 2: config A/B arms at b1/8k (the verdict's scale)
arm ms2048 BT_MS_SAMPLES=2048
arm bf16 BT_BF16=1
arm bf16_ms2048 BT_BF16=1 BT_MS_SAMPLES=2048
arm remat BT_REMAT=1

# bank the sweep + arms into committed artifacts/ (queue_lib contract)
. "$(dirname "$0")/queue_lib.sh"
bank "$OUT" logs/r4_e2e_ablate.log || true

step "chain complete"
