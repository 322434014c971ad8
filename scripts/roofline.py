"""Inference roofline statement (VERDICT round-4 task 4).

Combines the measured in-context stage costs (logs/r5_infer_ablate.jsonl,
produced by scripts/run_round5_queue.sh stage 4: one bench.py run per
BENCH_ABLATE arm, each a distinct jitted graph timed end-to-end on the
chip) with an ANALYTIC per-stage FLOP/byte model at production dims
(batch 4, N=10000, k=80, emb 128, ms_samples 5000) to state, per stage:

  measured ms/shape, matmul GFLOP, achieved TFLOP/s, % of v5e bf16 peak
  (MFU), minimum HBM GB moved, achieved GB/s, % of HBM peak, and the
  binding resource.

The point (round-4 verdict weak #3): the 28k shapes/hour plateau needs
either a lever or a wall statement. This pipeline is a geometry workload —
its dominant costs are top-k partial reductions (VPU), random gathers
(HBM), and many small fused elementwise stages — NOT dense matmul, so
"50% MFU" is not the applicable wall; the table quantifies which resource
each stage actually saturates.

Stage decomposition from the ablation arms (each arm REMOVES a stage from
the fused program, so stage cost = full - arm):
  net    = full - (cost attributable to everything else)   [reported raw]
  ms     = full - arm(ms)         mean-shift + NMS + escalations
  recon  = full - arm(recon)      the whole reconstruct_shape
  splines= full - arm(splines)    spline decoders inside reconstruct
  resid  = full - arm(residual)   residual metric inside reconstruct
  cov    = full - arm(coverage)   coverage metric inside reconstruct
  prep   = full - arm(preprocess) outlier-removal + upsampling
and arm(recon) = network + mean-shift + dispatch, so
  net+dispatch = arm(recon) - ms_cost.

Analytic model (per shape, f32 activations unless noted):
  kNN x3: score matmuls 2*N^2*C (C = 6, 64, 64) single-pass bf16 on MXU;
          score tensors N^2 f32 through VMEM/HBM; approx_max_k partial
          reduce over N^2 scores (VPU) — measured ~10 ms/[10k,10k] at
          recall 0.95 (RESULTS.md kernel table), the dominant net cost.
  EdgeConv gathers: N*k*C*4 B random-row HBM reads (C = 64, 64, 128).
  MLP/head matmuls: 2*N*Cin*Cout (mlp1 256->1024, conv1 1280->512,
          conv2 512->256, heads 256->{256,128} + 256->{256,10}).
  mean-shift: iterations * (2*S^2*D matmul + S^2 kernel elementwise),
          S = 5000, D = 128, iterations = 50 + escalation re-runs.
  SIOU:   one-hot [N,50] intersection matmul 2*N*50*50 + 50x50 LAP (~0).
  chamfer/coverage: fused tile-min over [N, S_surf] pairs.

Usage: python scripts/roofline.py [--arms logs/r5_infer_ablate.jsonl]
       [--out artifacts/r5_roofline.json]
No TPU needed — pure arithmetic over the recorded arms.
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# v5e single-chip peaks (public spec: 197 bf16 TFLOP/s, 819 GB/s HBM BW)
PEAK_TFLOPS_BF16 = 197.0
PEAK_HBM_GBS = 819.0

N = 10_000
K = 80
S_MS = 5_000
D_EMB = 128


def gflop_net():
    knn_scores = 2 * N * N * (6 + 64 + 64) / 1e9
    mlps = 2 * N * (256 * 1024 + 1280 * 512 + 512 * 256
                    + 256 * 256 + 256 * 128 + 256 * 256 + 256 * 10) / 1e9
    edge = 2 * 2 * N * (6 * 64 + 64 * 64 + 64 * 128) / 1e9
    return knn_scores + mlps + edge


def gbyte_net():
    gathers = N * K * (64 + 64 + 128) * 4 / 1e9
    scores = 3 * N * N * 4 / 1e9          # score tensors touch HBM once
    acts = 20 * N * 256 * 4 / 1e9         # order-of-magnitude activation traffic
    return gathers + scores + acts


def gflop_ms(iterations=50):
    return iterations * 2 * S_MS * S_MS * D_EMB / 1e9


def gbyte_ms(iterations=50):
    # Pallas kernel keeps tiles in VMEM; per iteration it streams X (S*D)
    # and the [S,S] kernel matrix once
    return iterations * (S_MS * S_MS * 4 + 2 * S_MS * D_EMB * 4) / 1e9


def load_arms(path):
    arms = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "result" in rec:
                arms[rec["arm"]] = rec["result"]["detail"]["per_shape_ms"]
    return arms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default=os.path.join(
        REPO, "logs/r5_infer_ablate.jsonl"))
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts/r5_roofline.json"))
    args = ap.parse_args()

    arms = load_arms(args.arms)
    if "full" not in arms:
        raise SystemExit(f"{args.arms}: no successful 'full' arm yet")
    full = arms["full"]

    def cost(name):
        return full - arms[name] if name in arms else None

    ms_cost = cost("ms")
    recon_cost = cost("recon")
    # arm(recon) = net + mean-shift + dispatch => net+dispatch residual:
    net_plus_dispatch = (arms.get("recon") - ms_cost
                         if "recon" in arms and ms_cost is not None else None)

    stages = []

    def add(name, ms, gf, gb, note):
        if ms is None or ms <= 0:
            stages.append({"stage": name, "ms_per_shape": ms, "note": note})
            return
        tf = gf / ms * 1e3 / 1e3  # GFLOP / ms -> TFLOP/s
        gbs = gb / ms * 1e3
        stages.append({
            "stage": name, "ms_per_shape": round(ms, 2),
            "gflop": round(gf, 2), "tflops": round(tf, 3),
            "mfu_pct": round(100 * tf / PEAK_TFLOPS_BF16, 2),
            "hbm_gb": round(gb, 3), "gbs": round(gbs, 1),
            "hbm_pct": round(100 * gbs / PEAK_HBM_GBS, 1),
            "note": note,
        })

    add("network (DGCNN fwd, incl 3x kNN)", net_plus_dispatch,
        gflop_net(), gbyte_net(),
        "bound: approx_max_k partial reduce (VPU) — ~10 ms/[10k,10k] "
        "measured at recall 0.95, x3 kNNs; matmul MFU is structurally low "
        "because scores are rank-3/64 contractions")
    add("mean-shift (guard, 50 it, S=5000)", ms_cost,
        gflop_ms(), gbyte_ms(),
        "Pallas flash-style kernel; [S,S] kernel matrix per iteration")
    add("reconstruct (fits+splines+metrics)", recon_cost, 0.0, 0.0,
        "decomposed below")
    for arm, label in (("splines", "  splines (decoders+refit)"),
                       ("residual", "  residual metric"),
                       ("coverage", "  coverage metric"),
                       ("preprocess", "  eval preprocess")):
        add(label, cost(arm), 0.0, 0.0, "delta vs full")
    stages.append({"stage": "TOTAL full pipeline",
                   "ms_per_shape": full,
                   "note": "includes ~30 ms/batch-4 tunnel dispatch "
                           "(7.5 ms/shape) amortized via staging overlap"})

    out = {"peaks": {"bf16_tflops": PEAK_TFLOPS_BF16,
                     "hbm_gbs": PEAK_HBM_GBS},
           "dims": {"batch": 4, "n_points": N, "k": K,
                    "ms_samples": S_MS, "emb": D_EMB},
           "arms_per_shape_ms": arms,
           "stages": stages}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)

    hdr = (f"{'stage':<38}{'ms/shape':>9}{'GFLOP':>8}{'TFLOP/s':>9}"
           f"{'MFU%':>7}{'GB':>7}{'GB/s':>7}{'HBM%':>6}")
    print(hdr)
    for s in stages:
        print(f"{s['stage']:<38}"
              f"{s.get('ms_per_shape') if s.get('ms_per_shape') is not None else '—':>9}"
              f"{s.get('gflop', ''):>8}{s.get('tflops', ''):>9}"
              f"{s.get('mfu_pct', ''):>7}{s.get('hbm_gb', ''):>7}"
              f"{s.get('gbs', ''):>7}{s.get('hbm_pct', ''):>6}")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
