"""Generate synthetic stand-in datasets with the reference's h5 schema.

The reference ships download_dataset.sh (wget from a server; this environment
has zero egress). This script creates ABC-like segment shapes and spline
patches so every trainer and eval runs out of the box.

Usage: python scripts/make_synthetic_data.py [--shapes N] [--splines N] [--points N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parsenet_tpu.data.synthetic import write_abc_h5, write_spline_h5

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", type=int, default=256)
    ap.add_argument("--splines", type=int, default=512)
    ap.add_argument("--points", type=int, default=10000)
    ap.add_argument("--out", default="data")
    args = ap.parse_args()
    for split, n, seed in (("train", args.shapes, 0),
                           ("val", max(args.shapes // 6, 8), 1),
                           ("test", max(args.shapes // 6, 8), 2)):
        path = f"{args.out}/shapes/{split}_data.h5"
        write_abc_h5(path, n, num_points=args.points, seed=seed)
        print("wrote", path)
    write_spline_h5(f"{args.out}/spline/open_splines.h5", args.splines,
                    num_points=700, seed=3)
    write_spline_h5(f"{args.out}/spline/closed_splines.h5", args.splines,
                    num_points=700, closed=True, seed=4)
    print("wrote spline h5s")
