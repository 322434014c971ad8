#!/usr/bin/env python
"""Roofline statement for the inference pipeline (round-4 verdict task 4).

Pairs the BENCH_ABLATE stage costing (logs/r5_infer_ablate.jsonl, produced
by scripts/run_round5_queue.sh stage 4 on the chip) with closed-form
FLOP/byte models of each stage at production dims, and states achieved
vs v5e peak (MFU / bandwidth utilization) per stage.

Stage times from ground-truth ablation (bench.py BENCH_ABLATE): the arm
`X` runs the pipeline WITH stage X stubbed, so

    cost(X) = t(full) - t(arm X)            for X in {ms, recon, ...}
    cost(net) = t(arm recon) + t(arm ms) - t(full)

(`recon`-ablated = net + clustering; `ms`-ablated = net + reconstruction
with ground-truth labels — the net forward appears in both, the full run
once, so the inclusion-exclusion above isolates it). Sub-stages of recon
(splines / residual / coverage / preprocess) subtract directly from full.

Analytic models (documented inline) count MXU FLOPs and HBM bytes at the
bench's production dims. Peaks: TPU v5e 197 TFLOP/s bf16 MXU (this repo's
default matmul precision is single-pass bf16 — CLAUDE.md), 819 GB/s HBM.
A stage is called compute-bound or bandwidth-bound by whichever roofline
leg gives the larger lower-bound time; "attributed" time (top-k partial
reductions, relay fixed cost) is reported separately so the MFU number
never silently absorbs non-matmul work.

Usage:
    python scripts/roofline.py [--ablate logs/r5_infer_ablate.jsonl]
                               [--out artifacts/r5_roofline.json]

Reference bar: north star BASELINE.md:24-27; reference pipeline
test.py:106-168 has no such statement (torch eager, per-shape loops).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys

# ---- v5e peaks -----------------------------------------------------------
PEAK_BF16_TFLOPS = 197.0          # MXU, bf16 single-pass (public v5e spec)
PEAK_HBM_GBPS = 819.0             # HBM bandwidth (public v5e spec)

# ---- production bench dims ----------------------------------------------
B = 4            # BENCH_BATCH default (measured optimum)
N = 10_000       # points/shape
K = 80           # kNN neighbours
EMB = 128        # embedding dim
MS_SAMPLES = 5_000   # mean-shift subsample (bench: min(5000, N))
MS_ITERS = 50        # mean-shift iterations (library default, 10 + 40 guard)
K_MAX = 50       # segment slots
SURF_GRID = 64   # per-segment surface sample grid (64^2 = 4096)
COV_SAMPLES = 10_000  # coverage sample budget


def gf(x: float) -> float:
    return x / 1e9


def _net_model() -> dict:
    """DGCNN forward (models/dgcnn.py): 3 chunked kNNs + 3 fused EdgeConvs
    + dense trunk/heads, batch B at N points, k=80.

    FLOPs (MXU matmuls only; top-k is counted as 'attributed' work):
      kNN scores: layer1 joint metric = two [N,3]x[3,N] dots;
                  layers 2,3 = one [N,64]x[64,N] dot each.
      EdgeConv dense: two [N,Cin]->[N,Cout] matmuls per layer.
      Trunk: mlp1 256->1024, conv1 1280->512, conv2 512->256,
             heads 2x(256->256) + 256->EMB + 256->10.
    Bytes (HBM):
      kNN score tensors: [N, N] f32 per layer (chunked writes+reads by the
        top-k consumer; counted once).
      neighbour gathers: N*k*C*4 random-row reads per layer
        (C = 64, 64, 128) — the four fused reductions write only [N, C].
      activations: small next to the above, ignored.
    """
    knn_flops = B * (2 * (2 * N * N * 3) + 2 * (2 * N * N * 64))
    edge_dense = B * 2 * (2 * N * 6 * 64 + 2 * N * 64 * 64 + 2 * N * 64 * 128)
    trunk = B * (2 * N * 256 * 1024 + 2 * N * 1280 * 512 + 2 * N * 512 * 256
                 + 2 * (2 * N * 256 * 256) + 2 * N * 256 * EMB
                 + 2 * N * 256 * 10)
    flops = knn_flops + edge_dense + trunk
    score_bytes = B * 3 * N * N * 4
    gather_bytes = B * N * K * (64 + 64 + 128) * 4
    return dict(flops=flops, bytes=score_bytes + gather_bytes,
                note="plus 12 approx_max_k [10k,10k]->80 partial reductions "
                     "(attributed, non-MXU)")


def _ms_model() -> dict:
    """Mean-shift clustering (ops/mean_shift.py Pallas kernel, bf16 dots):
    MS_ITERS iterations of [S, S] pairwise dots at D=EMB on S=MS_SAMPLES,
    plus the final [N, S] assignment pass. Bytes: the kernel streams the
    [S, EMB] matrix per tile pass; score tiles stay in VMEM (fused), so
    HBM traffic ~ iters * S * EMB * 2 (bf16)."""
    flops = B * (MS_ITERS * 2 * MS_SAMPLES * MS_SAMPLES * EMB
                 + 2 * N * MS_SAMPLES * EMB)
    byts = B * (MS_ITERS * MS_SAMPLES * EMB * 2 + N * EMB * 4)
    return dict(flops=flops, bytes=byts,
                note="Pallas fused tiles; pure mean-shift when a 'siou' arm "
                     "is present (stage_costs subtracts it), else the arm "
                     "also includes SIOU matching (~69 ms/batch in round 2)")


def _siou_model() -> dict:
    """SIOU + matching (ops/segmentation.py): one-hot [N, K_MAX] masks,
    [K_MAX, N] x [N, K_MAX] intersection matmuls (pred x gt), IoU table,
    on-device LAP auction (measured 0.1 ms/solve-batch). Mostly one-hot
    scatter + small matmuls; the mask materialization dominates bytes."""
    flops = B * (2 * 2 * K_MAX * N * K_MAX)     # two intersection matmuls
    byts = B * (2 * N * K_MAX * 4 + N * 8)      # two one-hot masks + labels
    return dict(flops=flops, bytes=byts, note="one-hot masks + LAP auction")


def _splines_model() -> dict:
    """SplineNet decoders over spline slots (fitting/pipeline.py): batched
    dual-decoder forward on up-/down-sampled segment points (700 ctrl pts,
    EdgeConv stack at k=10 on <=1600 pts per slot, <=K_MAX slots; in
    practice spline slots are ~10-20% of segments). Modeled at 8 active
    slots/shape, 1600 pts: 3 EdgeConvs (64,64,128) + [1600,1600] kNNs."""
    S, P = 8, 1600
    knn = 2 * (2 * P * P * 64) + 2 * P * P * 3
    dense = 2 * (2 * P * 6 * 64 + 2 * P * 64 * 64 + 2 * P * 64 * 128)
    trunk = 2 * P * 256 * 1024
    flops = B * S * (knn + dense + trunk)
    byts = B * S * (3 * P * P * 4 + P * 10 * (64 + 64 + 128) * 4)
    return dict(flops=flops, bytes=byts, note="~8 spline slots/shape est.")


def _residual_model() -> dict:
    """Residual distances (ops/primitive_dist.py): analytic point-to-
    primitive distance for every (slot, point) pair — [K_MAX, N] map of
    ~30-flop closed forms, VPU work, negligible MXU."""
    flops = B * K_MAX * N * 30
    return dict(flops=flops, bytes=B * K_MAX * N * 4, note="VPU elementwise")


def _coverage_model() -> dict:
    """Coverage two-sided chamfer (ops/chamfer.py Pallas tile-min):
    [COV_SAMPLES, N] + [N, COV_SAMPLES] sqdist tiles at C=3."""
    flops = B * 2 * (2 * COV_SAMPLES * N * 3)
    byts = B * 2 * (COV_SAMPLES + N) * 3 * 4  # tiles fused in VMEM
    return dict(flops=flops, bytes=byts, note="Pallas fused tile-min")


def _preprocess_model() -> dict:
    """Eval preprocessing (ops/preprocess.py): per-segment outlier trim +
    with-replacement resample — gathers and order statistics, VPU/HBM."""
    return dict(flops=B * N * 200, bytes=B * N * 6 * 4 * 4, note="VPU/gather")


MODELS = {
    "net": _net_model,
    "ms": _ms_model,
    "siou": _siou_model,
    "splines": _splines_model,
    "residual": _residual_model,
    "coverage": _coverage_model,
    "preprocess": _preprocess_model,
}


KNOWN_ARMS = ("full", "ms", "siou", "recon", "splines", "residual",
              "coverage", "preprocess")


def load_arm_times(path: str) -> dict:
    """{arm: per-batch seconds} from the queue's jsonl ({"arm":, "result":}).

    Replicate arms (label + trailing digits, e.g. recon2 re-measuring
    recon) are merged by MIN time: the axon relay's failure modes are
    one-sided (slow claim / wedge recovery inflates every dispatch — the
    20:27Z round-5 recon arm measured 41x the full pipeline right after a
    959 s preflight recovery), so the fastest replicate is the best
    estimate of the program's true cost."""
    times = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if "result" not in rec:
                continue
            r = rec["result"]
            # bench.py metric is shapes/hour; per-BATCH seconds = B*3600/v
            v = r["value"]
            if not v:
                continue
            batch = r.get("detail", {}).get("batch", B)
            # replicate labels are a KNOWN arm name + ONE digit (recon2,
            # splines3, ...). Anything else keeps its own label — a
            # variant like 'ms2048' or 'chunk5000' must never silently
            # fold into a stage arm by MIN.
            arm = rec["arm"]
            m = re.fullmatch(r"([a-z_]+)(\d)", arm)
            if m and m.group(1) in KNOWN_ARMS:
                arm = m.group(1)
            t = batch * 3600.0 / v
            times[arm] = min(times.get(arm, math.inf), t)
    return times


def stage_costs(times: dict) -> dict:
    """Per-batch stage seconds by ground-truth-ablation subtraction.

    A NEGATIVE cost means the ablated program ran slower than the full
    pipeline — an anomalous measurement (relay degradation or an XLA
    schedule pathology in the reduced graph), not a real stage cost; such
    arms are dropped from the table and listed under 'anomalous'."""
    full = times["full"]
    costs, anomalous = {}, {}
    for arm in ("ms", "siou", "recon", "splines", "residual", "coverage",
                "preprocess"):
        if arm in times:
            c = full - times[arm]
            if c < 0:
                anomalous[arm] = times[arm]
            else:
                costs[arm] = c
    # the 'ms' ablation stubs clustering AND the SIOU matching; a 'siou'
    # arm (matching only) splits them so 'ms' becomes pure mean-shift.
    # A siou cost exceeding the combined cost is itself anomalous.
    if "ms" in costs and "siou" in costs:
        pure_ms = costs["ms"] - costs["siou"]
        if pure_ms >= 0:
            costs["ms"] = pure_ms
        else:
            anomalous["siou"] = times["siou"]
            del costs["siou"]
    if "recon" in costs and "ms" in costs:
        # inclusion-exclusion is only as good as its inputs: a net cost
        # outside [0, full] means at least one arm time is relay-inflated
        # (the direct subtractions are individually guarded above, but the
        # SUM of two mildly-degraded arms can still overshoot) — report it
        # as anomalous rather than printing an absurd MFU row
        net = times["recon"] + times["ms"] - full
        if 0.0 <= net <= full:
            costs["net"] = net
        else:
            anomalous["net"] = net
    costs["full"] = full
    costs["_anomalous"] = anomalous
    return costs


def roofline_rows(costs: dict) -> list:
    rows = []
    for name, model_fn in MODELS.items():
        if name not in costs:
            continue
        m = model_fn()
        t = costs[name]
        t_mxu = m["flops"] / (PEAK_BF16_TFLOPS * 1e12)
        t_hbm = m["bytes"] / (PEAK_HBM_GBPS * 1e9)
        bound = "compute" if t_mxu >= t_hbm else "bandwidth"
        floor = max(t_mxu, t_hbm)
        rows.append(dict(
            stage=name,
            measured_ms=round(t * 1e3, 1),
            model_gflops=round(gf(m["flops"]), 1),
            model_gb=round(m["bytes"] / 1e9, 2),
            roofline_floor_ms=round(floor * 1e3, 2),
            bound=bound,
            mfu_pct=round(100 * m["flops"] / (t * PEAK_BF16_TFLOPS * 1e12),
                          2) if t > 0 else None,
            hbm_util_pct=round(100 * m["bytes"] / (t * PEAK_HBM_GBPS * 1e9),
                               2) if t > 0 else None,
            fraction_of_floor=round(floor / t, 3) if t > 0 else None,
            note=m["note"],
        ))
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", default="logs/r5_infer_ablate.jsonl")
    ap.add_argument("--out", default="artifacts/r5_roofline.json")
    args = ap.parse_args(argv)

    times = load_arm_times(args.ablate)
    if "full" not in times:
        print(f"roofline: no 'full' arm in {args.ablate}; run the queue "
              "stage-4 sweep first", file=sys.stderr)
        return 1
    costs = stage_costs(times)
    anomalous = costs.pop("_anomalous")
    rows = roofline_rows(costs)

    accounted = sum(costs[r["stage"]] for r in rows)
    out = dict(
        batch=B, num_points=N, k=K,
        peaks=dict(bf16_tflops=PEAK_BF16_TFLOPS, hbm_gbps=PEAK_HBM_GBPS),
        per_batch_s=dict(full=costs["full"],
                         accounted=accounted,
                         unattributed=costs["full"] - accounted),
        anomalous_arm_times_s={k: round(v, 4)
                               for k, v in anomalous.items()},
        stages=rows,
        arm_times_s={k: round(v, 4) for k, v in times.items()},
        method="ground-truth ablation subtraction (bench.py BENCH_ABLATE); "
               "cost(net) = t(recon-ablated) + t(ms-ablated) - t(full)",
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)

    hdr = (f"{'stage':<11}{'meas ms':>9}{'GFLOP':>8}{'GB':>7}"
           f"{'floor ms':>10}{'bound':>11}{'MFU%':>7}{'HBM%':>7}{'x-floor':>9}")
    print(hdr)
    for r in rows:
        print(f"{r['stage']:<11}{r['measured_ms']:>9}{r['model_gflops']:>8}"
              f"{r['model_gb']:>7}{r['roofline_floor_ms']:>10}"
              f"{r['bound']:>11}{r['mfu_pct']:>7}{r['hbm_util_pct']:>7}"
              f"{r['fraction_of_floor']:>9}")
    print(f"full {costs['full']*1e3:.1f} ms/batch-{B}; accounted "
          f"{accounted*1e3:.1f} ms; unattributed "
          f"{(costs['full']-accounted)*1e3:.1f} ms "
          f"(relay fixed cost ~30 ms/dispatch + top-k partial reductions)")
    for arm, t in anomalous.items():
        if arm == "net":
            print(f"ANOMALOUS net cost: inclusion-exclusion gave "
                  f"{t*1e3:.1f} ms (outside [0, full]) — at least one of "
                  "the recon/ms arm times is relay-inflated; dropped")
        else:
            print(f"ANOMALOUS arm {arm}: {t*1e3:.1f} ms/batch > full — "
                  "dropped (relay degradation or reduced-graph schedule "
                  "pathology); re-measure before trusting")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
