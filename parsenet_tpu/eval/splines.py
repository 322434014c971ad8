"""SplineNet evaluation (open & closed).

Equivalent of reference test_open_splines.py / test_closed_control_points.py:
load a trained decoder, run the test split, report two-sided sqrt chamfer
between predicted and GT surfaces, optionally run the classical
post-optimization refit, and export gt/pred/optim meshes as PLY.
"""
from __future__ import annotations

import logging
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import Checkpointer
from ..core.config import Config
from ..ops.chamfer import chamfer_distance
from ..models.splinenet import SplineNet
from ..ops.bspline import close_control_grid, sample_surface, uniform_knot_bspline
from ..postprocess import optimize_spline_kronecker, tessellate_grid, write_ply
from ..train.train_spline import rescale_outputs

log = logging.getLogger(__name__)


def evaluate_splinenet(config: Config, closed: bool = False,
                       test_gen: Optional[Iterator] = None,
                       num_batches: Optional[int] = None,
                       variables=None, if_optimize: bool = False,
                       export_dir: Optional[str] = None,
                       anisotropic: bool = True) -> dict:
    """Returns {'cd': mean two-sided sqrt chamfer, 'cd_optim': ...}."""
    from ..data.splines import SplineDataset

    grid = config.grid_size
    model = SplineNet(grid=grid, k=10, mode=1 if closed else 0)
    if variables is None:
        ckpt = Checkpointer(f"{config.log_dir}/checkpoints/{config.model_path}")
        target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 3)),
                            train=False)
        try:
            variables = ckpt.restore({"params": target["params"],
                                      "batch_stats": target["batch_stats"]})
        except Exception as e:
            raise SystemExit(
                f"checkpoint at {config.log_dir}/checkpoints/"
                f"{config.model_path} does not match the "
                f"{'closed' if closed else 'open'} SplineNet "
                f"(wrong model_path or open/closed mix-up?): {e}")
        if variables is None:
            raise SystemExit("no SplineNet checkpoint found; train first")

    if test_gen is None:
        default_tr, default_val = (28000, 3000) if closed else (50000, 10000)
        splits = (min(config.num_train, default_tr) or default_tr,
                  min(config.num_val, default_val) or default_val)
        ds = SplineDataset(config.dataset, config.batch_size, grid,
                           closed=closed, seed=config.seed, splits=splits)
        test_gen = ds.load_test_data(anisotropic=anisotropic)
        if num_batches is None:
            num_batches = max(ds.test_points.shape[0] // config.batch_size - 1, 1)
    num_batches = num_batches or 1

    nu, nv = uniform_knot_bspline(grid, grid, 3, 3, 40)
    nu, nv = jnp.asarray(nu), jnp.asarray(nv)
    if closed:
        nu_c, nv_c = uniform_knot_bspline(grid + 1, grid, 3, 3, 40)
        nu_c, nv_c = jnp.asarray(nu_c), jnp.asarray(nv_c)

    @jax.jit
    def forward(points):
        return model.apply(variables, points, train=False)

    cds, cds_opt = [], []
    for b in range(num_batches):
        points, cps, scales, _ = next(test_gen)
        out = forward(jnp.asarray(points))
        if anisotropic:
            out, pts_r, cps_r = rescale_outputs(
                jnp.asarray(scales.astype(np.float32)), out,
                jnp.asarray(points), jnp.asarray(cps))
        else:
            pts_r, cps_r = jnp.asarray(points), jnp.asarray(cps)
        if closed:
            cp_grid = close_control_grid(out.reshape(-1, grid, grid, 3))
            recon = sample_surface(nu_c, nv_c, cp_grid)
            gt_recon = sample_surface(
                nu_c, nv_c, close_control_grid(cps_r))
        else:
            recon = sample_surface(nu, nv, out.reshape(-1, grid, grid, 3))
            gt_recon = sample_surface(nu, nv, cps_r)
        # two-sided sqrt chamfer between the (wrap-aware) sampled surface and
        # the input points (reference: test_closed_control_points.py:120-150)
        cd = chamfer_distance(recon, pts_r, sqrt=True)
        cds.append(float(cd))

        if if_optimize or export_dir:
            recon_np = np.asarray(recon)
            gt_np = np.asarray(gt_recon)
            # the sampled parameter grid is 40x40 for both open and closed
            # (closed differs in CONTROL rows, 21, not in samples)
            gu = 40
            for i in range(recon_np.shape[0]):
                inp = np.asarray(pts_r[i])
                if if_optimize:
                    refined = optimize_spline_kronecker(
                        recon_np[i], inp, closed=closed, grid_u=gu, grid_v=40,
                        eval_grid=(40, 40))
                    d1 = np.sqrt(((refined[:, None] - inp[None]) ** 2
                                  ).sum(-1).min(1)).mean()
                    d2 = np.sqrt(((inp[:, None] - refined[None]) ** 2
                                  ).sum(-1).min(1)).mean()
                    cds_opt.append(0.5 * (d1 + d2))
                if export_dir:
                    os.makedirs(export_dir, exist_ok=True)
                    v, t = tessellate_grid(recon_np[i], gu, 40,
                                           wrap_u=closed)
                    write_ply(f"{export_dir}/pred_{b}_{i}.ply", v, t)
                    v, t = tessellate_grid(gt_np[i], gu, 40, wrap_u=closed)
                    write_ply(f"{export_dir}/gt_{b}_{i}.ply", v, t)
        log.info("batch %d cd %.5f", b, cds[-1])
    out = {"cd": float(np.mean(cds))}
    if cds_opt:
        out["cd_optim"] = float(np.mean(cds_opt))
    log.info("MEAN test cd %.5f%s", out["cd"],
             f" optim {out['cd_optim']:.5f}" if cds_opt else "")
    return out
