#!/bin/sh
# Round-4 phase-1 TPU queue (VERDICT round-3 tasks 1, 2, 5 + NEXT.md
# follow-up). Sequential single-chip work, launched once with:
#
#   setsid nohup sh scripts/run_round4_queue.sh \
#       > logs/r4_queue.log 2>&1 < /dev/null &
#
# Steps (each writes its own artifact under logs/ and is SKIPPED when the
# artifact already exists, so a crashed/restarted queue resumes where it
# stopped — marker files, not PID-watching, per ADVICE round 3):
#   1. confirm the stranded round-3c candidate on the 10k gate (stream a)
#   2. measure it on the secondary held-out stream b
#   3. measure the SHIPPED params on stream b (noise baseline)
#   4. two-stream promotion decision (scripts/promote_candidate.py)
#   5. 12-epoch continuation fine-tune from the (possibly new) shipped params
#   6. export + two-stream gate on the new candidate + promotion decision
#   7. 3-arm kNN-recall A/B table on the FINAL shipped params
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

step() { echo "== $(date -u +%H:%M:%SZ) $*"; }

bench_run() { # bench_run <out.json> <params.npz> <stream>
  out="$1"; par="$2"; stream="$3"
  if [ -s "$out" ] && grep -q '"seg_iou"' "$out"; then
    step "skip bench $out (artifact exists)"; return 0
  fi
  step "bench -> $out (params=$par stream=$stream)"
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  BENCH_PARAMS="$par" BENCH_STREAM="$stream" \
    python bench.py > "$out" 2> "${out%.json}.err"
  rc=$?
  step "bench rc=$rc: $(cat "$out")"
  if [ "$rc" -eq 2 ]; then
    step "ABORT QUEUE: relay unreachable (rc=2); artifacts so far are valid"
    exit 2
  fi
  return $rc
}

promote() { # promote <tag> <cand> <gate_a> <gate_b> <shipped_b> <shipped_a...>
  tag="$1"; shift
  if [ -e "logs/r4_promote_$tag.ok" ] || [ -e "logs/r4_promote_$tag.fail" ]
  then step "skip promote $tag (decision recorded)"; return 0; fi
  if env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/promote_candidate.py "$@" \
      > "logs/r4_promote_$tag.log" 2>&1
  then touch "logs/r4_promote_$tag.ok"; step "promote $tag: PROMOTED"
  else touch "logs/r4_promote_$tag.fail"; step "promote $tag: not promoted"
  fi
  cat "logs/r4_promote_$tag.log"
}

# --- 1-3: three bench measurements -----------------------------------------
bench_run logs/r4_cand_a.json    logs/cand_e2e_r3c.npz   a || true
bench_run logs/r4_cand_b.json    logs/cand_e2e_r3c.npz   b || true
bench_run logs/r4_shipped_b.json params/parsenet_e2e.npz b || true

# --- 4: promotion decision for the round-3c candidate ----------------------
promote r3c --cand logs/cand_e2e_r3c.npz \
  --gate-a logs/r4_cand_a.json --gate-b logs/r4_cand_b.json \
  --shipped-b logs/r4_shipped_b.json --shipped-a-json BENCH_r03.json

# --- 5: 12-epoch continuation fine-tune from the current shipped params ----
if [ -s logs/cand_e2e_r4b.npz ]; then
  step "skip fine-tune (candidate npz exists)"
else
  step "fine-tune: 12 epochs continuation from params/parsenet_e2e.npz"
  rm -rf logs/checkpoints/parsenet_e2e_ft   # never export a stale best-val
  timeout 7200 python scripts/finetune_e2e.py --epochs 12 \
    > logs/r4_finetune.log 2>&1
  step "fine-tune rc=$? (tail):"; tail -3 logs/r4_finetune.log
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/export_params.py --e2e-ckpt parsenet_e2e_ft \
    --e2e-out logs/cand_e2e_r4b.npz || step "export FAILED"
fi

# --- 6: two-stream gate + promotion for the new candidate ------------------
if [ -s logs/cand_e2e_r4b.npz ]; then
  bench_run logs/r4b_cand_a.json logs/cand_e2e_r4b.npz a || true
  bench_run logs/r4b_cand_b.json logs/cand_e2e_r4b.npz b || true
  if [ -e logs/r4_promote_r3c.ok ]; then
    # shipped params ARE the r3c candidate now; its stream measurements
    # are the baselines the new candidate must meet
    promote r4b --cand logs/cand_e2e_r4b.npz \
      --gate-a logs/r4b_cand_a.json --gate-b logs/r4b_cand_b.json \
      --shipped-b logs/r4_cand_b.json --shipped-a-json logs/r4_cand_a.json
  else
    promote r4b --cand logs/cand_e2e_r4b.npz \
      --gate-a logs/r4b_cand_a.json --gate-b logs/r4b_cand_b.json \
      --shipped-b logs/r4_shipped_b.json --shipped-a-json BENCH_r03.json
  fi
fi

# --- 7: the 3-arm kNN-recall A/B table on the FINAL shipped params ---------
if [ -s logs/ab_knn_r4.json ] && \
   ! grep -q '"error"' logs/ab_knn_r4.json; then
  step "skip kNN A/B (complete table exists)"
else
  step "kNN A/B: exact / 0.95 / 0.85 on params/parsenet_e2e.npz"
  BENCH_PARAMS=params/parsenet_e2e.npz \
    python scripts/ab_knn_recall.py --num-shapes 24 \
    --json-out logs/ab_knn_r4.json > logs/r4_ab_knn.log 2>&1
  step "kNN A/B rc=$? (table):"
  sed -n '/| recall |/,$p' logs/r4_ab_knn.log
fi

# bank terminal artifacts into committed artifacts/ (queue_lib contract);
# promotion itself already runs through scripts/promote_candidate.py above
. "$(dirname "$0")/queue_lib.sh"
bank logs/ab_knn_r4.json logs/r4_cand_a.json logs/r4_cand_b.json \
     logs/r4_shipped_b.json || true

step "queue complete"
