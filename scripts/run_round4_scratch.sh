#!/bin/sh
# Round-4 from-scratch training queue (VERDICT round-3 task 3 / Missing #3).
#
# Goal: demonstrate the CURRENT code training a floor-green checkpoint from
# RANDOM INIT with zero round-2 lineage — fresh SplineNet decoders, fresh
# segmentation net, fresh e2e fine-tune — then measure it on the two-stream
# 10k gate. Diagnosis informing the recipe (RESULTS.md round-4 section):
# the round-3 retrain used the same 960-shape/40-epoch budget as round 1
# but landed 0.02 below it on sk_2 — data/ is REGENERATED each session, so
# identical recipes sample different synthetic datasets and land within
# +/-0.02 of the floor; the fix is a bigger budget (2400 shapes x 48
# epochs, 3x the optimization, 2.5x the unique data) plus e2e best-epoch
# selection at the gate's own 10k-point scale (val_points=10000 — the
# round-3 retrain selected at 8k and its e2e val was 16 shapes, not 24).
#
# Everything trains into logs_scratch/ so the shipped lineage under logs/ +
# params/ is untouched until an explicit promotion decision. The gate bench
# measures the candidate with ITS OWN decoders via BENCH_SPLINE_DIR.
#
# Launch: setsid nohup sh scripts/run_round4_scratch.sh \
#           > logs/r4s_queue.log 2>&1 < /dev/null &
# Stages are SKIPPED when their marker/artifact exists (resumable).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs logs_scratch
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}

SEG_EPOCHS=${SCRATCH_SEG_EPOCHS:-48}
SEG_SHAPES=${SCRATCH_SEG_SHAPES:-2400}
E2E_EPOCHS=${SCRATCH_E2E_EPOCHS:-12}

step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

pystage() { # pystage <marker> <label> <python -c code>
  mark="logs/$1"; label="$2"; code="$3"
  if [ -e "$mark" ]; then step "skip $label (marker $mark)"; return 0; fi
  step "$label: start"
  python -c "import jax, os;
jax.config.update('jax_compilation_cache_dir', os.environ['JAX_COMPILATION_CACHE_DIR']);
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0);
$code" && touch "$mark" && step "$label: done" && return 0
  step "$label: FAILED (rc=$?)"; return 1
}

# --- 0: relay preflight (bounded fresh-process probes) ----------------------
step "preflight"
python -c "
from parsenet_tpu.core.preflight import wait_for_backend
import sys; sys.exit(0 if wait_for_backend(budget_s=1500) else 2)" || {
  step "ABORT: TPU relay unreachable"; exit 2; }

# --- 1: bigger synthetic dataset --------------------------------------------
pystage r4s_data.ok "data ($SEG_SHAPES shapes)" "
import subprocess, sys;
subprocess.check_call([sys.executable, 'scripts/make_synthetic_data.py',
                       '--shapes', '$SEG_SHAPES', '--splines', '512'])" || exit 1

# --- 2-3: SplineNet decoders from random init --------------------------------
pystage r4s_open.ok "open SplineNet (20 ep)" "
from parsenet_tpu.core.config import load_config;
from parsenet_tpu.train.train_spline import run_training;
cfg = load_config('configs/config_open_splines.yml', num_train=440,
                  num_val=36, num_test=36, num_epochs=20,
                  log_dir='logs_scratch');
run_training(cfg, closed=False)" || exit 1

pystage r4s_closed.ok "closed SplineNet (20 ep)" "
from parsenet_tpu.core.config import load_config;
from parsenet_tpu.train.train_spline import run_training;
cfg = load_config('configs/config_closed_splines.yml', num_train=440,
                  num_val=36, num_test=36, num_epochs=20,
                  log_dir='logs_scratch');
run_training(cfg, closed=True)" || exit 1

# --- 4: segmentation pretrain from random init -------------------------------
pystage r4s_seg.ok "seg pretrain ($SEG_SHAPES x $SEG_EPOCHS ep, b1 a6)" "
from parsenet_tpu.core.config import load_config;
from parsenet_tpu.train.train_seg import run_training;
cfg = load_config('configs/config_parsenet_normals.yml',
                  num_train=$SEG_SHAPES, num_val=160, num_test=160,
                  num_epochs=$SEG_EPOCHS, batch_size=1,
                  log_dir='logs_scratch');
run_training(cfg, num_accum=6)" || exit 1

# --- 5: e2e fine-tune, best-epoch selection at 10k val ------------------------
pystage r4s_e2e.ok "e2e fine-tune ($E2E_EPOCHS ep, 10k val selection)" "
from parsenet_tpu.core.config import load_config;
from parsenet_tpu.train.train_e2e import run_training;
cfg = load_config('configs/config_parsenet_e2e.yml', num_train=480,
                  num_val=160, num_test=160, num_epochs=$E2E_EPOCHS,
                  log_dir='logs_scratch');
run_training(cfg, val_shapes=24, val_points=10000)" || exit 1

# --- 6: export candidate npzs (params/ stays pristine) ------------------------
if [ -s logs/cand_scratch_e2e.npz ]; then
  step "skip export (candidate exists)"
else
  # decoders must exist: an empty dir would silently gate with the SHIPPED
  # decoders via the params/ npz fallback
  for d in open_splinenet closed_splinenet parsenet_e2e; do
    [ -n "$(ls -A logs_scratch/checkpoints/$d 2>/dev/null)" ] || {
      step "ABORT: logs_scratch/checkpoints/$d is empty"; exit 1; }
  done
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/export_params.py --log-dir logs_scratch \
    --e2e-out logs/cand_scratch_e2e.npz \
    --spline-out-prefix logs/cand_scratch_ || { step "export FAILED"; exit 1; }
fi

# --- 7: two-stream 10k gate with the candidate's OWN decoders -----------------
gate() { # gate <out.json> <stream>
  out="$1"; stream="$2"
  if [ -s "$out" ] && grep -q '"seg_iou"' "$out"; then
    step "skip gate $out"; return 0; fi
  step "gate -> $out (stream=$stream, scratch decoders)"
  BENCH_PARAMS=logs/cand_scratch_e2e.npz BENCH_SPLINE_DIR=logs_scratch \
  BENCH_STREAM="$stream" python bench.py > "$out" 2> "${out%.json}.err"
  rc=$?
  step "gate rc=$rc: $(cat "$out")"
  [ "$rc" -eq 2 ] && { step "ABORT: relay unreachable"; exit 2; }
  return 0
}
gate logs/r4s_gate_a.json a
gate logs/r4s_gate_b.json b

# --- 8: bank terminal artifacts + promote through the real gate ---------------
# (queue_lib contract: a queue must never end at "complete" + grep — that is
# how rounds 3 AND 4 stranded their best results in gitignored logs/)
. "$(dirname "$0")/queue_lib.sh"
bank logs/r4s_gate_a.json logs/r4s_gate_b.json || true
step "promotion gate (atomic bundle: e2e + both decoders)"
python scripts/promote_candidate.py \
  --cand logs/cand_scratch_e2e.npz \
  --gate-a logs/r4s_gate_a.json --gate-b logs/r4s_gate_b.json \
  --shipped-b artifacts/r4_shipped_b.json \
  --shipped-a-json BENCH_r04.json \
  --cand-spline-prefix logs/cand_scratch_ \
  --bank artifacts/
step "scratch queue complete (promotion rc=$?)"
