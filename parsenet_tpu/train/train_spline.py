"""SplineNet trainer (open & closed control-point prediction).

Equivalent of reference train_open_splines.py / train_closed_control_points.py:
DGCNN control-point decoder trained with
  loss = w * permutation-reg + (1 - w) * (one-sided chamfer + laplacian)
(laplacian excluded for closed splines, reference:
train_closed_control_points.py:173), Adam + ReduceLROnPlateau on val chamfer,
best-checkpoint saving.

TPU-native structure: one jitted train step over the batch-sharded mesh; the
reference's random point-count trick ("robust to density",
train_open_splines.py:152) uses a small set of bucketed static sizes so XLA
compiles each variant once instead of every count.
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import Checkpointer, PlateauScheduler
from ..core.logging import MetricsLogger
from ..core.config import Config
from ..losses.spline import (control_points_permute_closed_reg_loss,
                             control_points_permute_reg_loss, laplacian_loss,
                             spline_reconstruction_loss_one_sided,
                             spline_reconstruction_loss)
from ..models.splinenet import SplineNet
from ..ops.bspline import uniform_knot_bspline
from ..parallel.mesh import batch_sharding, make_mesh, replicate
from .state import TrainState, create_state

log = logging.getLogger(__name__)

POINT_BUCKETS = (448, 704, 960, 1216, 1472, 1728, 1984)


def rescale_outputs(scales: jnp.ndarray, output: jnp.ndarray,
                    points: jnp.ndarray, cps: jnp.ndarray):
    """Undo anisotropic per-axis normalization before the loss
    (reference: src/utils.py:361-390). scales: [B, 3]."""
    m = jnp.max(scales, axis=1)[:, None, None]
    output = output * scales[:, None, :] / m
    points = points * scales[:, None, :] / m
    cps = cps * scales[:, None, None, :] / m[..., None]
    return output, points, cps


def make_train_step(model: SplineNet, nu, nv, grid: int, closed: bool,
                    anisotropic: bool):
    reg_fn = (control_points_permute_closed_reg_loss if closed
              else control_points_permute_reg_loss)

    def loss_fn(params, batch_stats, points, cps, scales, loss_weight):
        out, mut = model.apply({"params": params, "batch_stats": batch_stats},
                               points, train=True, mutable=["batch_stats"])
        if anisotropic:
            out_r, pts_r, cps_r = rescale_outputs(scales, out, points, cps)
        else:
            out_r, pts_r, cps_r = out, points, cps
        cd, _ = spline_reconstruction_loss_one_sided(nu, nv, out_r, pts_r)
        l_reg, permuted = reg_fn(out_r, cps_r, grid)
        if closed:
            lap = jnp.zeros(())
        else:
            lap = laplacian_loss(out_r.reshape(-1, grid, grid, 3), permuted)
        loss = l_reg * loss_weight + (cd + lap) * (1.0 - loss_weight)
        metrics = {"loss": loss, "cd": cd, "l_reg": l_reg, "lap": lap}
        return loss, (mut["batch_stats"], metrics)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, points, cps, scales, lr, loss_weight):
        (_, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, points,
                                   cps, scales, loss_weight)
        new_state = state.apply_gradients(grads, lr, new_batch_stats=new_bs)
        return new_state, metrics

    @jax.jit
    def eval_step(state: TrainState, points, cps, scales):
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          points, train=False)
        if anisotropic:
            out, points, cps = rescale_outputs(scales, out, points, cps)
        cd, _ = spline_reconstruction_loss(nu, nv, out, points, sqrt=True)
        return cd

    return train_step, eval_step


def run_training(config: Config, closed: bool = False,
                 train_gen: Optional[Iterator] = None,
                 val_gen: Optional[Iterator] = None,
                 steps_per_epoch: Optional[int] = None,
                 val_steps: int = 4,
                 anisotropic: bool = True,
                 point_buckets=POINT_BUCKETS,
                 checkpoint: bool = True) -> TrainState:
    """Full training loop. Generators yield (points, cps, scales, Rs)."""
    from ..data.splines import SplineDataset

    mesh = make_mesh(config.num_devices)
    grid = config.grid_size
    nu_np, nv_np = uniform_knot_bspline(grid, grid, 3, 3, 40)
    nu, nv = jnp.asarray(nu_np), jnp.asarray(nv_np)

    if train_gen is None:
        # honor the config's split sizes when they are smaller than the
        # reference's fixed splits (tiny/synthetic datasets)
        default_tr, default_val = (28000, 3000) if closed else (50000, 10000)
        splits = (min(config.num_train, default_tr) or default_tr,
                  min(config.num_val, default_val) or default_val)
        ds = SplineDataset(config.dataset, config.batch_size, grid,
                           closed=closed, seed=config.seed, splits=splits)
        train_gen = ds.load_train_data(anisotropic=anisotropic, if_augment=True)
        val_gen = ds.load_val_data(anisotropic=anisotropic)

    from ..data.prefetch import lookahead
    train_gen = lookahead(train_gen)

    model = SplineNet(grid=grid, k=10, mode=1 if closed else 0)
    rng = jax.random.PRNGKey(config.seed)
    sample = jnp.zeros((config.batch_size, point_buckets[0], 3))
    state = create_state(model, rng, (sample,), optimizer=config.optim,
                         train=True)
    state = replicate(mesh, state)

    train_step, eval_step = make_train_step(model, nu, nv, grid, closed,
                                            anisotropic)
    sched = PlateauScheduler(config.lr, patience=10, factor=0.5, min_lr=3e-5)
    ckpt = (Checkpointer(f"{config.log_dir}/checkpoints/{config.model_path}")
            if checkpoint else None)
    bsh = batch_sharding(mesh)
    steps_per_epoch = steps_per_epoch or max(
        config.num_train // config.batch_size, 1)
    host_rng = np.random.RandomState(config.seed)
    best_cd = float("inf")
    lr = config.lr
    mlog = MetricsLogger(config.log_dir, config.model_path)

    for epoch in range(config.num_epochs):
        t0 = time.time()
        tr_metrics = []
        for _ in range(steps_per_epoch):
            points, cps, scales, _ = next(train_gen)
            npts = point_buckets[host_rng.randint(len(point_buckets))]
            npts = min(npts, points.shape[1])
            pts = jax.device_put(points[:, :npts], bsh)
            cps_d = jax.device_put(cps, bsh)
            scl = jax.device_put(scales.astype(np.float32), bsh)
            state, metrics = train_step(state, pts, cps_d, scl,
                                        jnp.float32(lr),
                                        jnp.float32(config.loss_weight))
            tr_metrics.append(metrics)
        val_cds = []
        for _ in range(val_steps):
            points, cps, scales, _ = next(val_gen)
            n = min(point_buckets[-1], points.shape[1])
            cd = eval_step(state, jax.device_put(points[:, :n], bsh),
                           jax.device_put(cps, bsh),
                           jax.device_put(scales.astype(np.float32), bsh))
            val_cds.append(float(cd))
        val_cd = float(np.mean(val_cds))
        lr = sched.step(val_cd)
        tr = {k: float(np.mean([float(m[k]) for m in tr_metrics]))
              for k in tr_metrics[0]}
        log.info("epoch %d loss %.5f cd %.5f reg %.5f val_cd %.5f lr %.2e "
                 "(%.1fs)", epoch, tr["loss"], tr["cd"], tr["l_reg"], val_cd,
                 lr, time.time() - t0)
        mlog.log(epoch, {**tr, "val_cd": val_cd, "lr": lr})
        if ckpt is not None and val_cd < best_cd:
            best_cd = val_cd
            ckpt.save(epoch, jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats}))
    if ckpt is not None:
        ckpt.wait()
    return state
