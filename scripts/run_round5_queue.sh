#!/bin/sh
# Round-5 chip queue (VERDICT round-4 tasks 3 + 4), resumable, self-banking.
#
# Stage 1  e2e train-step arms: base vs the Config.fast_step bundle
#          (FAST_STEP_KNOBS) at the trainer's real ms_samples=2048, plus
#          batch scaling — target >= 7 shapes/s (round-4 best: 5.37).
# Stage 2  seg train bench (one line, for assemble_train_bench).
# Stage 3  assemble BENCH_TRAIN_r05.json from seg + the SHIPPABLE fast arm
#          (fast_ms2048 — exactly what Config.fast_step trains with).
# Stage 4  inference stage-costing sweep (BENCH_ABLATE) for the roofline
#          statement: full, recon, ms, splines, residual, coverage,
#          preprocess. Ablated runs never floor (bench.py floors_applied).
# Stage 5  BENCH_DGCNN_BF16=1 full bench, floors applied — the untried
#          bf16-compute-dtype lever on the 28k plateau.
# Stage 6  fast-step quality gate: 2-epoch continuation fine-tune FROM the
#          shipped params WITH the fast step, export, 10k stream-a bench of
#          the candidate. Floors green => training with the fast step does
#          not regress quality (promotion still requires the two-stream
#          gate; this stage only validates the step, plateau expected).
# Final    bank all terminal JSONs into committed artifacts/ (queue_lib).
#
# Resume rule: every step checks for its SUCCESS artifact and skips;
# error records are retried (ADVICE round-4).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
ARMS=logs/r5_train_arms.jsonl
ABL=logs/r5_infer_ablate.jsonl
step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

step "preflight probe"
python - <<'EOF' || { step "ABORT: preflight failed"; exit 1; }
import sys
from parsenet_tpu.core.preflight import wait_for_backend
sys.exit(0 if wait_for_backend(budget_s=1800, probe_timeout_s=420,
                               sleep_s=20) else 1)
EOF

# ---- Stage 1: train arms ----------------------------------------------
arm() { # arm <label> <env...>
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

arm base DUMMY=1
arm fast BT_FAST=1
arm fast_ms2048 BT_FAST=1 BT_MS_SAMPLES=2048
arm fast_b2 BT_FAST=1 BT_MS_SAMPLES=2048 BT_BATCH=2
arm fast_b4 BT_FAST=1 BT_MS_SAMPLES=2048 BT_BATCH=4

# ---- Stage 2: seg train bench ------------------------------------------
if [ ! -s logs/r5_bt_seg.json ]; then
  step "seg train bench"
  timeout 3600 python scripts/bench_train.py seg > logs/r5_bt_seg.json \
    2> logs/r5_bt_seg.err || step "seg bench FAILED rc=$?"
fi

# ---- Stage 3: assemble BENCH_TRAIN_r05.json -----------------------------
if [ -s logs/r5_bt_seg.json ] && \
   grep -q '"arm": "fast_ms2048", "result"' "$ARMS" 2>/dev/null && \
   [ ! -s BENCH_TRAIN_r05.json ]; then
  step "assemble BENCH_TRAIN_r05.json"
  grep '"arm": "fast_ms2048", "result"' "$ARMS" | tail -1 | \
    sed 's/.*"result": //; s/}$//' > logs/r5_bt_e2e.json
  python scripts/assemble_train_bench.py logs/r5_bt_seg.json \
    logs/r5_bt_e2e.json BENCH_TRAIN_r05.json || step "assemble FAILED"
fi

# ---- Stage 4: inference stage-costing sweep -----------------------------
iarm() { # iarm <label> <BENCH_ABLATE value or "">
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

iarm full ""
iarm recon recon
iarm ms ms
iarm splines splines
iarm residual residual
iarm coverage coverage
iarm preprocess preprocess

# ---- Stage 5: bf16 DGCNN compute dtype, floors applied ------------------
if [ ! -s logs/r5_bf16_a.json ]; then
  step "bf16 DGCNN bench (floors applied)"
  timeout 5400 env BENCH_DGCNN_BF16=1 python bench.py \
    > logs/r5_bf16_a.json 2> logs/r5_bf16_a.err \
    || step "bf16 bench rc=$? (floor trip or failure — see err)"
fi

# ---- Stage 6: fast-step quality gate ------------------------------------
if [ ! -s data/shapes/train_data.h5 ]; then
  step "regenerating synthetic data (data/ is not in git)"
  timeout 3600 python scripts/make_synthetic_data.py --shapes 960 \
    --splines 512 || step "data regen FAILED rc=$?"
fi
if [ ! -s logs/cand_fastft_e2e.npz ]; then
  step "fast-step continuation fine-tune (2 epochs)"
  timeout 14400 python scripts/finetune_e2e.py --fast-step --epochs 2 \
    --model-path parsenet_e2e_fastft \
    > logs/r5_fastft.log 2>&1 || step "fine-tune FAILED rc=$?"
  if [ -d logs/checkpoints/parsenet_e2e_fastft ]; then
    python scripts/export_params.py --e2e-ckpt parsenet_e2e_fastft \
      --e2e-out logs/cand_fastft_e2e.npz || step "export FAILED"
  fi
fi
if [ -s logs/cand_fastft_e2e.npz ] && [ ! -s logs/r5_fastft_a.json ]; then
  step "fast-step candidate 10k gate (stream a)"
  timeout 5400 env BENCH_PARAMS=logs/cand_fastft_e2e.npz python bench.py \
    > logs/r5_fastft_a.json 2> logs/r5_fastft_a.err \
    || step "fastft gate rc=$? (floor trip or failure)"
fi

# ---- bank ---------------------------------------------------------------
. "$(dirname "$0")/queue_lib.sh"
bank "$ARMS" "$ABL" logs/r5_bt_seg.json logs/r5_bf16_a.json \
     logs/r5_fastft_a.json logs/r5_verify_a.json || true

step "round-5 queue complete"
