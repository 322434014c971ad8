#!/bin/sh
# Round-5 chip chain, part 4: inference-plateau levers the main queue does
# not cover — the kNN chunk size (ops/knn.py lax.map serializes N/chunk
# [chunk, N] matmul+top-k pairs per layer; larger chunks cut dispatch count
# at the cost of score-tensor liveness — round-3 measured UNchunked as a
# 38x schedule disaster at B=4, but 5000 was never tried) and the
# bf16-DGCNN x chunk-5000 combo. All full bench.py runs, floors applied,
# self-banking (queue_lib contract).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
KNOBS=logs/r5_knob_arms.jsonl
step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

step "waiting for part5 chain completion"
while ! grep -q "part5 chain complete" logs/r5_part5.log 2>/dev/null; do
  sleep 60
done
step "chip free — knob arms"

karm() { # karm <label> <env...>
  label="$1"; shift
  if grep -q "\"arm\": \"$label\", \"result\"" "$KNOBS" 2>/dev/null; then
    step "skip knob arm $label"; return 0; fi
  step "knob arm $label: start"
  out=$(timeout 5400 env "$@" python bench.py 2>logs/r5_karm_"$label".err)
  rc=$?
  line=$(echo "$out" | grep '^{' | tail -1)
  if [ "$rc" -eq 0 ] && [ -n "$line" ]; then
    echo "{\"arm\": \"$label\", \"result\": $line}" >> "$KNOBS"
    step "knob arm $label: $line"
  else
    echo "{\"arm\": \"$label\", \"error\": $rc}" >> "$KNOBS"
    step "knob arm $label FAILED rc=$rc (floor trip or failure)"
  fi
}

# chunk 10000 (unchunked) is NOT an arm: round-3 measured it as a 38x
# end-to-end schedule disaster (ops/knn.py:_row_chunks docstring)
karm chunk5000 PARSENET_KNN_CHUNK=5000
karm bf16_chunk5000 BENCH_DGCNN_BF16=1 PARSENET_KNN_CHUNK=5000

. "$(dirname "$0")/queue_lib.sh"
bank "$KNOBS" || true
step "extra2 chain complete"
