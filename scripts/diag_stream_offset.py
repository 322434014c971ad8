"""Diagnose the validate-vs-bench 5.5pt seg-IoU offset (VERDICT r4 task 5).

The same weights score ~0.818 on the 24-shape validate protocol
(scripts/validate_reference.py: seed-2 test h5, exact kNN) but ~0.873 on
the 32-shape bench stream (bench.py: seed-7 generator stream, recall-0.85
kNN). The mechanical candidates were ruled down to two:

  population  the two slices draw different shapes from the SAME generator
              (make_shape_batch defaults); a slice census shows the
              validate slice is harder (mean 7.96 vs 7.16 segments,
              min-segment size 468 vs 574 points)
  protocol    something in the validate pipeline itself (exact kNN, batch-1
              reconstruct, key stream, h5 round-trip) scores lower

Decisive experiment: run the VALIDATE protocol on the BENCH shapes. This
script writes the bench stream-a timed slice (seed 7, shapes 8..8+N, RAW
generator output — ABCDataset applies the same mean-center +
align_canonical that bench.py applies via normalize_points) into a temp h5
layout, generates a config pointing at it, and runs
scripts/validate_reference.py on it. Outcome key:

  V(bench shapes) ~= 0.87  -> population explains the offset; protocols
                              agree on the same shapes
  V(bench shapes) ~= 0.82  -> the protocol mechanics differ; ablate next

Writes artifacts/r5_offset_diag.json with both runs' tables plus the
per-shape seg_iou / n_segments pairs for the variance attribution.

Usage: python scripts/diag_stream_offset.py [--num-shapes 24]
       [--knn exact|0.85] [--skip-std]
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PER_SHAPE = re.compile(r"shape (\d+): seg_iou ([0-9.]+) residual ([0-9.]+)")


def write_bench_slice(prefix: str, n: int) -> list:
    """Bench stream a's timed slice as an h5 test split (+ tiny val)."""
    import h5py
    import numpy as np
    from parsenet_tpu.data.synthetic import make_shape_batch

    host = np.random.RandomState(7)          # bench.py stream "a"
    warm = 8                                  # WARMUP(2) * BATCH(4)
    pts, lab, nrm, prim = make_shape_batch(host, warm + n, 10000)
    os.makedirs(prefix, exist_ok=True)
    for name, sl in (("test_data.h5", slice(warm, warm + n)),
                     ("val_data.h5", slice(0, 2))):
        with h5py.File(os.path.join(prefix, name), "w") as hf:
            hf.create_dataset("points", data=pts[sl])
            hf.create_dataset("labels", data=lab[sl])
            hf.create_dataset("normals", data=nrm[sl])
            hf.create_dataset("prim", data=prim[sl])
    return [int(len(set(l.tolist()))) for l in lab[warm:warm + n]]


def run_validate(config: str, n: int, knn: str, log_path: str,
                 params: str = "") -> dict:
    env = dict(os.environ)
    cmd = [sys.executable,
           os.path.join(REPO, "scripts/validate_reference.py"),
           config, "--num-shapes", str(n), "--knn-recall", knn]
    if params:
        # pin the weights: without --params, validate_reference prefers any
        # orbax checkpoint under cfg.log_dir, so a stale logs/checkpoints/
        # dir would silently swap the model under the diagnostic
        cmd += ["--params", params]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=7200)
    with open(log_path, "w") as f:
        f.write(out.stdout + "\n--- stderr ---\n" + out.stderr)
    shapes = [(int(m.group(1)), float(m.group(2)), float(m.group(3)))
              for m in PER_SHAPE.finditer(out.stdout)]
    last = [l for l in out.stdout.splitlines() if l.startswith("{")]
    summary = json.loads(last[-1]) if last else None
    return {"rc": out.returncode, "summary": summary,
            "per_shape": [{"i": i, "seg_iou": s, "residual": r}
                          for i, s, r in shapes]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-shapes", type=int, default=24)
    ap.add_argument("--knn", default="exact")
    ap.add_argument("--skip-std", action="store_true",
                    help="skip the standard-validate arm (reuse a previous "
                         "measurement for the seed-2 slice)")
    ap.add_argument("--params",
                    default=os.path.join(REPO, "params/parsenet_e2e.npz"),
                    help="npz weights to evaluate (default: the shipped "
                         "bundle; '' lets validate_reference resolve)")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "r5_offset_diag.json"))
    args = ap.parse_args()

    prefix = "/tmp/offset_bench_slice/"
    nseg_bench = write_bench_slice(prefix, args.num_shapes)

    # temp config = eval_final with the dataset swapped to the bench slice
    base = open(os.path.join(REPO, "configs/config_eval_final.yml")).read()
    swapped = base.replace('dataset = "data/shapes/"',
                           f'dataset = "{prefix}"')
    assert swapped != base, "config dataset line not found"
    cfg_path = "/tmp/offset_bench_slice/config.yml"
    with open(cfg_path, "w") as f:
        f.write(swapped)

    result = {"num_shapes": args.num_shapes, "knn": args.knn,
              "bench_slice_n_segments": nseg_bench}
    print("== validate protocol on BENCH shapes (seed-7 stream slice)",
          flush=True)
    result["validate_on_bench_shapes"] = run_validate(
        cfg_path, args.num_shapes, args.knn,
        os.path.join(REPO, "logs/r5_offset_vbench.log"), params=args.params)
    if not args.skip_std:
        print("== validate protocol on ITS OWN shapes (seed-2 h5 slice)",
              flush=True)
        result["validate_standard"] = run_validate(
            os.path.join(REPO, "configs/config_eval_final.yml"),
            args.num_shapes, args.knn,
            os.path.join(REPO, "logs/r5_offset_vstd.log"), params=args.params)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    vb = result["validate_on_bench_shapes"]["summary"]
    print(json.dumps({"metric": "offset_diag",
                      "v_on_bench_seg_iou":
                          next((r["measured"] for r in vb["rows"]
                                if r["metric"] == "seg_iou"), None)
                          if vb else None,
                      "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
