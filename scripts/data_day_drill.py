"""Real-data drill without egress (round-4 verdict task 8).

Proves the COMPLETE data-day chain runs with zero code changes:

    fetch (file:// fixture) -> sha256 pins -> unzip into repo layout ->
    schema validation -> scripts/validate_reference.py parity table
    (--params params/parsenet_e2e.npz, the shipped weights)

The fixture is a data.zip + predictions.h5 built from the same synthetic
generators the test suite uses (parsenet_tpu.data.synthetic), laid out
exactly like the reference's download
(`/root/reference/download_dataset.sh`, readme_data.md: data/shapes/*.h5,
data/spline/*.h5, predictions.h5). On real-data day, replace --source with
the real URL base and the pins with the published checksums; everything
downstream is THIS code path.

Usage:
  python scripts/data_day_drill.py [--workdir /tmp/drill] [--points 2048]
      [--shapes 12] [--eval-shapes 2] [--keep]

Exit 0 = full chain green (fetch + schema + parity table produced).
"""
import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def build_fixture(serve_dir, points, shapes):
    """data.zip + predictions.h5 with the reference download's layout."""
    import h5py
    import numpy as np
    from parsenet_tpu.data.synthetic import write_abc_h5, write_spline_h5

    stage = os.path.join(serve_dir, "_stage")
    for split, n, seed in (("train", shapes, 0), ("val", shapes, 1),
                           ("test", shapes, 2)):
        write_abc_h5(os.path.join(stage, "data", "shapes",
                                  f"{split}_data.h5"),
                     n, num_points=points, seed=seed)
    for fam, closed in (("open", False), ("closed", True)):
        write_spline_h5(os.path.join(stage, "data", "spline",
                                     f"{fam}_splines.h5"),
                        8, num_points=700, closed=closed, seed=3 + closed)
    zpath = os.path.join(serve_dir, "data.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(stage, "data")):
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, stage))
    # the reference also serves precomputed stage-1 predictions
    with h5py.File(os.path.join(serve_dir, "predictions.h5"), "w") as f:
        f.create_dataset("seg_id", data=np.zeros((shapes, points), "i4"))
        f.create_dataset("pred_primitives",
                         data=np.zeros((shapes, points), "i4"))
    shutil.rmtree(stage)
    return {name: sha256(os.path.join(serve_dir, name))
            for name in ("data.zip", "predictions.h5")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/data_day_drill")
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--shapes", type=int, default=12)
    ap.add_argument("--eval-shapes", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    if os.path.exists(wd):
        shutil.rmtree(wd)
    serve = os.path.join(wd, "serve")
    dest = os.path.join(wd, "dest")
    os.makedirs(serve)
    os.makedirs(dest)

    print("drill: building file:// fixture", flush=True)
    pins = build_fixture(serve, args.points, args.shapes)

    print("drill: fetch + sha256 + unzip + schema validation", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fetch_dataset.py"),
         "--source", f"file://{serve}", "--dest", dest,
         "--num-points", str(args.points)]
        + [x for n, h in pins.items() for x in ("--sha256", f"{n}={h}")],
        cwd=REPO)
    if r.returncode != 0:
        sys.exit(f"drill: fetch/schema FAILED rc={r.returncode}")

    # the fetched tree must be complete: 5 h5s in layout + predictions.h5
    for rel in ("data/shapes/train_data.h5", "data/shapes/val_data.h5",
                "data/shapes/test_data.h5", "data/spline/open_splines.h5",
                "data/spline/closed_splines.h5", "logs/predictions.h5"):
        if not os.path.exists(os.path.join(dest, rel)):
            sys.exit(f"drill: fetched tree missing {rel}")

    print("drill: parity protocol on the fetched data (shipped params)",
          flush=True)
    cfg = os.path.join(wd, "config_drill.yml")
    with open(cfg, "w") as f:
        f.write(f"""# data-day drill eval config (generated)
[train]
model_path = "parsenet_e2e"
dataset = "{dest}/data/shapes/"
normals = True
num_train = 0
num_val = {args.shapes}
num_test = {args.shapes}
num_points = {args.points}
grid_size = 20
batch_size = 1
mode = 5
knn_k = 80
""")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "validate_reference.py"),
         cfg, "--params", os.path.join(REPO, "params", "parsenet_e2e.npz"),
         "--num-shapes", str(args.eval_shapes)],
        cwd=REPO, env=env, capture_output=True, text=True)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-2000:])
    if r.returncode != 0 or "=== parity vs" not in r.stdout:
        sys.exit("drill: validate_reference FAILED to produce parity table")
    # the JSON summary line is machine-checkable evidence
    last = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    summary = json.loads(last)
    assert summary["n_shapes"] == args.eval_shapes, summary
    print(f"drill: GREEN — fetch->sha256->schema->parity chain complete "
          f"({summary['n_shapes']} shapes evaluated)")
    if not args.keep:
        shutil.rmtree(wd)


if __name__ == "__main__":
    main()
