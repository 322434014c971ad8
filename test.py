"""Full fitting + reconstruction evaluation (reference: test.py).

Reads predictions.h5 (from generate_predictions.py), fits every segment,
and reports residual + coverage (sk/pk @ {0.01, 0.02}) + SIOU. With
--optimize, spline-segment surfaces are additionally refined by the
classical kronecker least-squares refit (reference: residual_eval_mode
if_optimize) before the coverage metrics.

Usage: python test.py configs/config_parsenet_normals.yml [start] [end] [--optimize]
"""
import sys

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.core.config import load_config
from parsenet_tpu.core.logging import setup_logging
from parsenet_tpu.data.abc import ABCDataset
from parsenet_tpu import cpp as native
from parsenet_tpu.eval.pipeline import protocol_coverage, reconstruct_shape
from parsenet_tpu.postprocess import optimize_spline_kronecker
from parsenet_tpu.train.train_e2e import build_spline_fit


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    if set(flags) - {"--optimize"}:
        raise SystemExit(f"unknown flag(s) {sorted(set(flags) - {'--optimize'})}; "
                         "supported: --optimize")
    if_optimize = "--optimize" in flags
    cfg = load_config(args[0] if args else None)
    start = int(args[1]) if len(args) > 1 else 0
    end = int(args[2]) if len(args) > 2 else cfg.num_test
    log = setup_logging(cfg.log_dir, "test")
    ds = ABCDataset(1, path_prefix=cfg.dataset or "data/shapes/",
                    train_size=0, val_size=cfg.num_val,
                    test_size=cfg.num_test, normals=True, primitives=True,
                    if_train_data=False)
    with h5py.File("logs/predictions.h5", "r") as hf:
        seg_ids = np.array(hf.get("seg_id"))
        pred_prims = np.array(hf.get("pred_primitives"))
    spline_fit = build_spline_fit(cfg.grid_size, log_dir=cfg.log_dir)
    key = jax.random.PRNGKey(cfg.seed)
    res, cov, sk1, sk2 = [], [], [], []
    render_shapes = []
    for i, (points, labels, normals, prim) in enumerate(ds.get_test()):
        if i < start:
            continue
        if i >= end:
            break
        key, sub = jax.random.split(key)
        rec = reconstruct_shape(jnp.asarray(points[0]), jnp.asarray(normals[0]),
                                jnp.asarray(seg_ids[i]),
                                jnp.asarray(pred_prims[i]), sub,
                                spline_fit=spline_fit)
        p_cov, s1, s2 = float(rec.p_cov), float(rec.sk_1), float(rec.sk_2)
        if if_optimize:
            # classical per-segment spline refit on the host, then recompute
            # coverage with the refined surfaces substituted
            surf = np.array(rec.surface_points)  # copy: jax views are read-only
            w = np.array(rec.area_weights)
            mask = np.asarray(rec.surface_mask).astype(bool)
            labels_i = seg_ids[i]
            prim_remap = pred_prims[i].copy()
            for v in (0, 6, 7):
                prim_remap[prim_remap == v] = 9
            prim_remap[prim_remap == 8] = 2
            g = int(round(surf.shape[1] ** 0.5))
            for k in np.where(mask)[0]:
                seg_pts = points[0][labels_i == k]
                # reference gates: splines need >=100 points, the classical
                # refit only runs above 200 (primitive_forward.py:978-996)
                if len(seg_pts) <= 200:
                    continue
                seg_prim = np.bincount(prim_remap[labels_i == k],
                                       minlength=10).argmax()
                if seg_prim not in (2, 9):
                    continue
                # statistical outlier removal before the refit, as the
                # reference does in eval mode (primitive_forward.py:989)
                seg_pts = native.remove_outliers(seg_pts.astype(np.float32))
                # refit on a 32x32 subgrid (the LAP correspondence is
                # O(n^3); 4096 samples would take minutes), evaluate the
                # refined spline back on the full g x g grid
                sub32 = surf[k].reshape(g, g, 3)[::g // 32, ::g // 32]
                surf[k] = optimize_spline_kronecker(
                    sub32.reshape(-1, 3), seg_pts,
                    closed=bool(seg_prim == 9), grid_u=32, grid_v=32,
                    eval_grid=(g, g))
                # refreshed area weights for the refit grid
                s3 = surf[k].reshape(g, g, 3)
                tu = np.gradient(s3, axis=0)
                tv = np.gradient(s3, axis=1)
                w[k] = np.linalg.norm(np.cross(tu, tv), axis=-1).reshape(-1)
            flat = surf.reshape(-1, 3)
            fw = (mask[:, None] * w).reshape(-1).astype(np.float32)
            c, s1j, s2j = protocol_coverage(jnp.asarray(points[0]),
                                            jnp.asarray(flat),
                                            jnp.asarray(fw), sub)
            p_cov, s1, s2 = float(c), float(s1j), float(s2j)
        res.append(float(rec.residual)); cov.append(p_cov)
        sk1.append(s1); sk2.append(s2)
        log.info("shape %d residual %.4f cov %.4f sk1 %.3f sk2 %.3f", i,
                 res[-1], cov[-1], sk1[-1], sk2[-1])
        if len(render_shapes) < 8:
            render_shapes.append(_trimmed_segment_meshes(rec, points[0],
                                                         seg_ids[i]))
    log.info("MEAN residual %.4f chamfer-cov %.4f sk1 %.3f sk2 %.3f",
             np.mean(res), np.mean(cov), np.mean(sk1), np.mean(sk2))
    # rendered grid of reconstructions — the offline equivalent of the
    # reference's Open3D screenshot pipelines (src/VisUtils.py:246-400)
    from parsenet_tpu.postprocess.viz import render_reconstruction_grid
    if render_shapes and render_reconstruction_grid(
            "logs/reconstructions_grid.png", render_shapes):
        log.info("wrote logs/reconstructions_grid.png")


def _trimmed_segment_meshes(rec, points, labels, epsilon: float = 0.1):
    """Per-segment eps-trimmed surface meshes for rendering (the reference
    trims triangles farther than eps from the input, fitting_utils.py:
    646-691)."""
    from parsenet_tpu.postprocess.meshing import (remove_unreferenced,
                                                  tessellate_grid,
                                                  trim_mesh_by_distance)
    segs = []
    surf = np.asarray(rec.surface_points)
    mask = np.asarray(rec.surface_mask).astype(bool)
    g = int(round(surf.shape[1] ** 0.5))
    for k in np.where(mask)[0]:
        seg_pts = points[labels == k]
        if len(seg_pts) < 20:
            continue
        v, t = tessellate_grid(surf[k], g, g)
        t = trim_mesh_by_distance(v, t, seg_pts, epsilon)
        if len(t) == 0:
            continue
        v, t = remove_unreferenced(v, t)
        segs.append((v, t, int(k)))
    return segs


if __name__ == "__main__":
    main()
