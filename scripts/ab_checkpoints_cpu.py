"""CPU-only relative A/B of two exported checkpoints (full param sets:
seg net + spline decoders) through the real inference pipeline at reduced
scale. TPU-independent: used during the 2026-08-17 relay outage to verify
the round-3 retrain before shipping params/ (round-3 result: seg_iou
0.777 vs 0.758, prim_iou 0.879 vs 0.816, residual 0.0174 vs 0.0232,
sk_2 0.773 vs 0.741 in round-3's favor).

Absolute numbers are NOT protocol-comparable (fewer points, no eval
preprocessing in the seg stage) — only the relative ordering between the
two arms is meaningful; both arms see identical shapes/keys.

CAVEAT (learned the hard way, 2026-08-18): even the *ordering* does not
reliably transfer to the 10k-point production protocol — the round-3
retrain won this reduced-scale A/B on every axis yet measured worse than
the round-2 exports on the full bench stream (sk_2 0.839 vs 0.860, below
the 0.84 floor). Treat this script as a tie-breaker / smoke check during
TPU outages; the shipping gate is a green 10k-point `bench.py` floor run
(RESULTS.md "Round-3 capstone" post-mortem).

Usage: python scripts/ab_checkpoints_cpu.py [BASELINE_GIT_REV] \
           [--shapes 6] [--points 2500]
"""
import argparse
import os
import subprocess
import sys
import tempfile

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PARSENET_KNN_EXACT"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parsenet_tpu.core.checkpoint import load_npz_params  # noqa: E402
from parsenet_tpu.core.config import load_config  # noqa: E402
from parsenet_tpu.data.abc import ABCDataset  # noqa: E402
from parsenet_tpu.eval.pipeline import (predict_segmentation,  # noqa: E402
                                        reconstruct_shape)
from parsenet_tpu.models.dgcnn import PrimitivesEmbedding  # noqa: E402
from parsenet_tpu.train.train_e2e import build_spline_fit  # noqa: E402

NPZ = ("parsenet_e2e.npz", "open_splinenet.npz", "closed_splinenet.npz")


def _git_npz(rev, name, tmp):
    p = os.path.join(tmp, name)
    out = subprocess.run(["git", "-C", REPO, "show", f"{rev}:params/{name}"],
                         capture_output=True, check=True)
    with open(p, "wb") as f:
        f.write(out.stdout)
    return load_npz_params(p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline_rev", nargs="?", default="HEAD~1",
                    help="git rev whose params/ to compare against the "
                         "working tree's")
    ap.add_argument("--shapes", type=int, default=6)
    ap.add_argument("--points", type=int, default=2500)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp()
    cfg = load_config(os.path.join(REPO, "configs", "config_eval_final.yml"))
    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5,
                                k=cfg.knn_k)
    arms = {
        f"baseline({args.baseline_rev})": tuple(
            _git_npz(args.baseline_rev, n, tmp) for n in NPZ),
        "working-tree": tuple(
            load_npz_params(os.path.join(REPO, "params", n)) for n in NPZ),
    }

    ds = ABCDataset(1, path_prefix=os.path.join(REPO, "data", "shapes") + "/",
                    train_size=0, val_size=cfg.num_val, test_size=cfg.num_test,
                    normals=True, primitives=True, if_train_data=False)
    shapes = []
    rs = np.random.RandomState(0)
    for i, (points, labels, normals, prim) in enumerate(ds.get_test()):
        if i >= args.shapes:
            break
        sel = rs.choice(points.shape[1], args.points, replace=False)
        shapes.append((points[0, sel], labels[0, sel], normals[0, sel],
                       prim[0, sel]))

    for name, (e2e, open_v, closed_v) in arms.items():
        params = e2e["params"]
        apply_fn = jax.jit(lambda x, p=params: model.apply({"params": p}, x))
        sfit = build_spline_fit(cfg.grid_size, open_vars=open_v,
                                closed_vars=closed_v)
        key = jax.random.PRNGKey(cfg.seed)
        agg = {k: [] for k in ("seg_iou", "prim_iou", "residual", "sk_2")}
        for pts, lab, nrm, pr in shapes:
            x = np.concatenate([pts, nrm], -1)
            key, k1, k2 = jax.random.split(key, 3)
            pred = predict_segmentation(
                apply_fn, jnp.asarray(x, jnp.float32), jnp.asarray(lab),
                jnp.asarray(pr), k1, ms_num_samples=args.points)
            rec = reconstruct_shape(jnp.asarray(pts), jnp.asarray(nrm),
                                    pred.labels, pred.pred_prim, k2,
                                    spline_fit=sfit)
            agg["seg_iou"].append(float(pred.seg_iou))
            agg["prim_iou"].append(float(pred.prim_iou))
            agg["residual"].append(float(rec.residual))
            agg["sk_2"].append(float(rec.sk_2))
        print(f"== {name}: " + " ".join(
            f"{k} {np.mean(v):.4f}" for k, v in agg.items()), flush=True)


if __name__ == "__main__":
    main()
