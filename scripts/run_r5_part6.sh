#!/bin/sh
# Round-5 chip chain, part 6: re-measure the two ANOMALOUS ablation arms
# and finalize the roofline artifact.
#
# The 20:27Z recon arm and 20:52Z splines arm of the stage-4 sweep ran
# 41x/50x SLOWER than the full pipeline — both right after a relay wedge
# (the recon arm's preflight needed 959 s to recover; see
# logs/r5_iarm_recon.err). An ablated program is a strict subgraph of the
# full one, so "slower than full" is a measurement anomaly, not a stage
# cost. Re-run both arms under fresh labels (recon2/splines2 — roofline.py
# merges replicates by MIN time), then compute artifacts/r5_roofline.json.
# Self-banking (queue_lib contract).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
ABL=logs/r5_infer_ablate.jsonl
step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

step "waiting for extra2 chain completion"
while ! grep -q "extra2 chain complete" logs/r5_extra2.log 2>/dev/null; do
  sleep 60
done
step "chip free — part6 (anomalous-arm re-measure)"

iarm() { # iarm <label> <BENCH_ABLATE value>  (same contract as stage 4)
  label="$1"; abl="$2"
  if grep -q "\"arm\": \"$label\", \"result\"" "$ABL" 2>/dev/null; then
    step "skip infer arm $label"; return 0; fi
  step "infer arm $label: start (ablate='$abl')"
  out=$(timeout 5400 env BENCH_ABLATE="$abl" python bench.py \
        2>logs/r5_iarm_"$label".err)
  rc=$?
  line=$(echo "$out" | grep '^{' | tail -1)
  if [ "$rc" -eq 0 ] && [ -n "$line" ]; then
    echo "{\"arm\": \"$label\", \"result\": $line}" >> "$ABL"
    step "infer arm $label: $line"
  else
    echo "{\"arm\": \"$label\", \"error\": $rc}" >> "$ABL"
    step "infer arm $label FAILED rc=$rc"
  fi
}

iarm recon2 recon
iarm splines2 splines

step "roofline"
python scripts/roofline.py --ablate "$ABL" \
  --out artifacts/r5_roofline.json \
  > logs/r5_roofline.log 2>&1 || step "roofline FAILED rc=$?"

. "$(dirname "$0")/queue_lib.sh"
bank "$ABL" artifacts/r5_roofline.json logs/r5_roofline.log || true
step "part6 chain complete"
