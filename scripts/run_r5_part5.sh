#!/bin/sh
# Round-5 chip chain, part 5: the recall-0.85 fast-step bundle.
#
# The stage-1 arms measured the stride bundle at 6.77 shapes/s (target
# >= 7). Commit dd6ee48 extends the shippable fast-step bundle with
# train-graph kNN recall 0.85 (stop-gradient indices; r4 eval A/B:
# <=0.7pt seg IoU exact->0.85). This chain:
#   1. measures the extended bundle (arm fast_r85 — exactly what
#      Config.fast_step now trains with);
#   2. if the main queue's stage-6 fine-tune gate (which ran with the
#      NEW code, i.e. the full bundle incl. recall) is floors-green,
#      reassembles BENCH_TRAIN_r05.json from the fast_r85 arm;
#   3. if that gate TRIPPED, runs the strides-only fallback fine-tune
#      (PARSENET_FAST_KNN_RECALL=0) + gate so the round still ships a
#      gated fast step, and leaves BENCH_TRAIN_r05.json at fast_ms2048.
# Self-banking (queue_lib contract).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
ARMS=logs/r5_train_arms.jsonl
step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

step "waiting for extra chain completion"
while ! grep -q "extra chain complete" logs/r5_extra.log 2>/dev/null; do
  sleep 60
done
step "chip free — part5"

arm() { # arm <label> <env...>  (same contract as run_round5_queue.sh)
  label="$1"; shift
  if grep -q "\"arm\": \"$label\", \"result\"" "$ARMS" 2>/dev/null; then
    step "skip arm $label"; return 0; fi
  step "arm $label: start"
  out=$(timeout 3600 env "$@" python scripts/bench_train.py e2e \
        2>logs/r5_arm_"$label".err)
  rc=$?
  line=$(echo "$out" | grep '^{' | tail -1)
  if [ "$rc" -eq 0 ] && [ -n "$line" ]; then
    echo "{\"arm\": \"$label\", \"result\": $line}" >> "$ARMS"
    step "arm $label: $line"
  else
    echo "{\"arm\": \"$label\", \"error\": $rc}" >> "$ARMS"
    step "arm $label FAILED rc=$rc"
  fi
}

arm fast_r85 BT_FAST=1 BT_MS_SAMPLES=2048

gate_green() { # gate_green <bench json>
  [ -s "$1" ] && grep -q '"quality_ok": true' "$1" \
    && grep -q '"floors_applied": true' "$1"
}

if gate_green logs/r5_fastft_a.json; then
  if grep -q '"arm": "fast_r85", "result"' "$ARMS" 2>/dev/null && \
     [ -s logs/r5_bt_seg.json ]; then
    step "stage-6 gate green (full bundle) — reassembling BENCH_TRAIN_r05"
    grep '"arm": "fast_r85", "result"' "$ARMS" | tail -1 | \
      sed 's/.*"result": //; s/}$//' > logs/r5_bt_e2e_r85.json
    python scripts/assemble_train_bench.py logs/r5_bt_seg.json \
      logs/r5_bt_e2e_r85.json BENCH_TRAIN_r05.json \
      || step "reassemble FAILED"
  fi
else
  step "stage-6 gate NOT green — strides-only fallback fine-tune"
  if [ ! -s logs/cand_fastft2_e2e.npz ]; then
    timeout 14400 env PARSENET_FAST_KNN_RECALL=0 \
      python scripts/finetune_e2e.py --fast-step --epochs 2 \
      --model-path parsenet_e2e_fastft2 \
      > logs/r5_fastft2.log 2>&1 || step "fallback fine-tune FAILED rc=$?"
    if [ -d logs/checkpoints/parsenet_e2e_fastft2 ]; then
      python scripts/export_params.py --e2e-ckpt parsenet_e2e_fastft2 \
        --e2e-out logs/cand_fastft2_e2e.npz || step "export FAILED"
    fi
  fi
  if [ -s logs/cand_fastft2_e2e.npz ] && [ ! -s logs/r5_fastft2_a.json ]; then
    step "fallback candidate 10k gate (stream a)"
    timeout 5400 env BENCH_PARAMS=logs/cand_fastft2_e2e.npz python bench.py \
      > logs/r5_fastft2_a.json 2> logs/r5_fastft2_a.err \
      || step "fallback gate rc=$? (floor trip or failure)"
  fi
fi

. "$(dirname "$0")/queue_lib.sh"
bank "$ARMS" || true
[ -s logs/r5_fastft2_a.json ] && bank logs/r5_fastft2_a.json
step "part5 chain complete"
