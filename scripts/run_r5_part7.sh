#!/bin/sh
# Round-5 chip chain, part 7: final roofline refinements.
#
#   1. the NEW 'siou' ablation arm (bench.py BENCH_ABLATE=siou: mean-shift
#      runs, the SIOU/LAP matching is stubbed) — splits the conflated
#      ms+siou stage so the roofline's dominant attributed stage is pure
#      mean-shift (scripts/roofline.py stage_costs subtracts it);
#   2. re-run the top-k/gather micro-probe with HOST-FETCH timing — the
#      first run measured ~0 ms for every op because the tunneled
#      runtime's block_until_ready returns early (CLAUDE.md); the fixed
#      _timed fetches a scalar per iteration;
#   3. recompute artifacts/r5_roofline.json over the full arm table
#      (replicates merged by MIN; part6 re-measured recon/splines).
# Self-banking (queue_lib contract).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
ABL=logs/r5_infer_ablate.jsonl
step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

step "waiting for part6 chain completion"
while ! grep -q "part6 chain complete" logs/r5_part6.log 2>/dev/null; do
  sleep 60
done
step "chip free — part7"

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

iarm siou siou

step "top-k/gather probe (host-fetch timing)"
timeout 3600 python scripts/probe_topk_gather.py \
  --out artifacts/r5_topk_probe.json \
  > logs/r5_topk_probe.log 2>&1 || step "probe FAILED rc=$?"

step "final roofline"
python scripts/roofline.py --ablate "$ABL" \
  --out artifacts/r5_roofline.json \
  > logs/r5_roofline.log 2>&1 || step "roofline FAILED rc=$?"

. "$(dirname "$0")/queue_lib.sh"
bank "$ABL" artifacts/r5_roofline.json logs/r5_roofline.log \
     logs/r5_topk_probe.log || true
step "part7 chain complete"
