"""End-to-end ParSeNet trainer: segmentation + differentiable fitting.

Equivalent of reference train_parsenet_e2e.py: the pretrained segmentation
net is fine-tuned with the residual fitting loss flowing through mean-shift
clustering, membership weights, closed-form fits, and the FROZEN SplineNet
decoders (reference: residual_utils.py:50-66), plus the triplet and NLL
losses. Reference runs batch 1 with 5-step gradient accumulation on 8k
points; here the whole loss (network -> clustering -> fitting) is ONE jitted
graph per shape, vmapped over the (sharded) batch — no cuda:0/cuda:1 split,
no host round-trips, no try/except batch skipping (the NaN/Inf gradient
guard handles degenerate fits, reference train_parsenet_e2e.py:243-257).
"""
from __future__ import annotations

import functools
import logging
import os
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import Checkpointer
from ..core.config import Config
from ..core.logging import MetricsLogger
from ..fitting.pipeline import FittingLossOut, fitting_loss_shape, make_spline_apply
from ..losses.embedding import primitive_nll_loss, triplet_loss
from ..models.dgcnn import PrimitivesEmbedding
from ..models.splinenet import SplineNet
from ..ops.bspline import uniform_knot_bspline
from ..parallel.mesh import batch_sharding, make_mesh, replicate
from .state import TrainState, create_state, grad_finite

log = logging.getLogger(__name__)


def load_splinenet_variables(log_dir: str, model_path: str, grid: int = 20,
                             closed: bool = False):
    """Restore trained SplineNet variables from a checkpoint directory
    (equivalent of the reference's frozen logs/pretrained_models/
    {open,closed}_spline.pth loads, residual_utils.py:50-66). Returns None
    when no checkpoint exists."""
    from ..core.checkpoint import Checkpointer
    model = SplineNet(grid=grid, k=10, mode=1 if closed else 0)
    target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 3)),
                        train=False)
    ckpt = Checkpointer(f"{log_dir}/checkpoints/{model_path}")
    if ckpt.latest_step() is None:
        return None
    return ckpt.restore({"params": target["params"],
                         "batch_stats": target["batch_stats"]})


def build_spline_fit(grid: int = 20, sample_grid: int = 30,
                     open_vars=None, closed_vars=None, rng=None,
                     log_dir: Optional[str] = None):
    """Create the frozen spline-fit closure.

    Pretrained variables are loaded from `{log_dir}/checkpoints/
    {open,closed}_splinenet` when available; otherwise randomly initialized
    decoders are used (smoke tests / benches) with a warning."""
    open_model = SplineNet(grid=grid, k=10, mode=0)
    closed_model = SplineNet(grid=grid, k=10, mode=1)
    if open_vars is None and log_dir is not None:
        open_vars = load_splinenet_variables(log_dir, "open_splinenet", grid)
        closed_vars = load_splinenet_variables(log_dir, "closed_splinenet",
                                               grid, closed=True)
        if open_vars is None or closed_vars is None:
            open_vars = closed_vars = None
    if open_vars is None and grid == 20:
        # committed trained exports (scripts/export_params.py) — keeps
        # bench.py and fresh clones on trained decoders without retraining
        import os
        from ..core.checkpoint import load_npz_params
        root = os.path.join(os.path.dirname(__file__), "..", "..")
        open_vars = load_npz_params(os.path.join(root, "params",
                                                 "open_splinenet.npz"))
        closed_vars = load_npz_params(os.path.join(root, "params",
                                                   "closed_splinenet.npz"))
        if open_vars is not None and closed_vars is not None:
            log.info("loaded SplineNet decoders from committed params/ npz")
        else:
            open_vars = closed_vars = None
    if open_vars is None:
        log.warning("no pretrained SplineNet weights found; "
                    "falling back to random decoders")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, 128, 3))
        open_vars = open_model.init(rng, dummy, train=False)
        closed_vars = closed_model.init(rng, dummy, train=False)
    nu, nv = uniform_knot_bspline(grid, grid, 3, 3, sample_grid)
    nu_c, nv_c = uniform_knot_bspline(grid + 1, grid, 3, 3, sample_grid)
    return make_spline_apply(open_model, open_vars, closed_model, closed_vars,
                             jnp.asarray(nu), jnp.asarray(nv),
                             jnp.asarray(nu_c), jnp.asarray(nv_c))


# The quality-gated fast-step bundle (Config.fast_step / BT_FAST=1): strided
# residual/spline/SIOU evaluation + 2-iteration stop-gradient escalation
# attempts. Each knob is a strict superset of the reference's own
# subsampling (fitting_loss_shape docstring); tests/test_train_knobs.py pins
# loss proximity and gradient-cosine > 0.9 vs the default graph.
# The bundle ALSO builds the TRAIN-time kNN graphs at approx_max_k recall
# 0.85 (FAST_KNN_RECALL -> PrimitivesEmbedding.knn_recall, run_training) —
# graph indices are stop-gradient, the r4 eval A/B measured <=0.7pt seg IoU
# exact->0.85 (artifacts/ab_knn_r4.json), and the fast-step fine-tune gate
# validates the whole bundle at default eval settings.
FAST_STEP_KNOBS = dict(spline_stride=4, residual_stride=2, siou_stride=2,
                       ms_attempt_iterations=2)
FAST_KNN_RECALL = 0.85


def make_e2e_step(model: PrimitivesEmbedding, spline_fit,
                  quantile: float = 0.025, iterations: int = 5,
                  lamb: float = 0.1, ms_num_samples: int = 2048,
                  with_normals: bool = True, num_accum: int = 1,
                  spline_stride: int = 2, residual_stride: int = 1,
                  siou_stride: int = 1,
                  ms_attempt_iterations=None, ms_attempt_pallas: bool = False,
                  ablate: tuple = ()):
    """num_accum > 1 accumulates gradients over micro-batches inside the
    jitted step via lax.scan (the reference loops .backward() five times,
    train_parsenet_e2e.py:174-294); inputs then carry a leading [A] axis.

    spline_stride / residual_stride / siou_stride / ms_attempt_*: perf
    knobs forwarded to fitting_loss_shape (see its docstring for the
    reference-parity argument per knob).

    ablate: static stage-costing knob for scripts/bench_train.py only (see
    fitting_loss_shape). Extra arms at this level: "fit" skips the whole
    fitting loss, "netgrad" stops gradients at the network outputs (prices
    the DGCNN backward pass). Production callers never set it."""
    def loss_fn(params, x, labels, prim, key):
        # x: [B, N, C]; per-shape fitting loss vmapped over the batch
        emb, prim_logp = model.apply({"params": params}, x)
        if "netgrad" in ablate:
            emb = jax.lax.stop_gradient(emb)
            prim_logp = jax.lax.stop_gradient(prim_logp)
        k1, k2 = jax.random.split(key)
        e_loss = triplet_loss(emb, labels, k1)
        p_loss = primitive_nll_loss(prim_logp, prim)
        points = x[..., :3]
        normals = x[..., 3:6] if with_normals else points
        pred_prim = jnp.argmax(prim_logp, axis=-1)
        keys = jax.random.split(k2, x.shape[0])
        if "fit" in ablate:
            z = jnp.zeros((x.shape[0],))
            fit_out = FittingLossOut(z + jnp.mean(emb) * 0.0, z, z, z, z,
                                     z.astype(jnp.int32))
        else:
            fit_out: FittingLossOut = jax.vmap(
                lambda p, n, e, l, pr, pp, kk: fitting_loss_shape(
                    p, n, e, l, pr, kk, pred_prim_per_point=pp,
                    spline_fit=spline_fit, quantile=quantile,
                    iterations=iterations, lamb=lamb,
                    ms_num_samples=ms_num_samples,
                    spline_stride=spline_stride,
                    residual_stride=residual_stride,
                    siou_stride=siou_stride,
                    ms_attempt_iterations=ms_attempt_iterations,
                    ms_attempt_pallas=ms_attempt_pallas,
                    ablate=tuple(a for a in ablate
                                 if a in ("ms", "match", "fits", "siou")))
            )(points, normals, emb, labels, prim, pred_prim, keys)
        res_loss = jnp.mean(fit_out.loss)
        total = e_loss + p_loss + res_loss
        metrics = {"embed_loss": e_loss, "prim_loss": p_loss,
                   "res_loss": res_loss,
                   "geom_loss": jnp.mean(fit_out.geom_loss),
                   "spline_loss": jnp.mean(fit_out.spline_loss),
                   "seg_iou": jnp.mean(fit_out.seg_iou),
                   "prim_iou": jnp.mean(fit_out.prim_iou),
                   "clusters": jnp.mean(fit_out.num_clusters.astype(jnp.float32))}
        return total, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, labels, prim, key, lr):
        if num_accum > 1:
            # x/labels/prim: [A, B, ...] micro-batches
            keys = jax.random.split(key, num_accum)

            def micro(carry, xs):
                g_acc, m_acc = carry
                xm, lm, pm, km = xs
                (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, xm, lm, pm, km)
                return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                        jax.tree_util.tree_map(jnp.add, m_acc, m)), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zero_m = {k: jnp.float32(0.0) for k in
                      ("embed_loss", "prim_loss", "res_loss", "geom_loss",
                       "spline_loss", "seg_iou", "prim_iou", "clusters")}
            (grads, metrics), _ = jax.lax.scan(
                micro, (zero_g, zero_m), (x, labels, prim, keys))
            inv = 1.0 / num_accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)
        else:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x, labels, prim, key)
        ok = grad_finite(grads)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        new_state = state.apply_gradients(grads, lr)
        metrics["grad_ok"] = ok.astype(jnp.float32)
        return new_state, metrics

    @jax.jit
    def eval_step(state: TrainState, x, labels, prim, key):
        _, metrics = loss_fn(state.params, x, labels, prim, key)
        return metrics

    return train_step, eval_step


def run_training(config: Config, train_gen: Optional[Iterator] = None,
                 val_gen: Optional[Iterator] = None,
                 steps_per_epoch: Optional[int] = None,
                 val_steps: int = 2,
                 points_per_shape: int = 8000,
                 open_vars=None, closed_vars=None,
                 pretrained_params=None,
                 lamb: float = 0.1,
                 val_shapes: Optional[int] = 16,
                 val_points: Optional[int] = None) -> TrainState:
    """val_shapes: FIXED validation sample for best-checkpoint selection —
    the checkpoint written on val-seg-IoU improvement is what eval harnesses
    restore (latest == best). The reference keeps only periodic latest saves
    (train_parsenet_e2e.py:298-306); selecting on a fixed val sample instead
    removed a 5-point held-out IoU swing caused by scoring epochs on 2
    streaming shapes (round-3 capstone). None = `val_steps` batches,
    streaming, save-every-epoch (legacy behavior for the mesh tests).

    val_points: point count for the fixed val sample; None = train's
    points_per_shape. The round-3 post-mortem (RESULTS.md) showed
    reduced-scale selection ranking does not transfer to the 10k bench
    protocol — pass 10000 so best-checkpoint selection scores epochs at
    the scale the shipping gate measures (costs one extra eval_step
    compile at the val shape)."""
    from ..data.abc import ABCDataset

    mesh = make_mesh(config.num_devices)
    num_accum = max(config.accum, 1)
    if train_gen is None:
        ds = ABCDataset(config.batch_size * num_accum,
                        train_size=config.num_train,
                        val_size=config.num_val, test_size=config.num_test,
                        normals=True, primitives=True)
        train_gen = ds.get_train(if_normal_noise=True)
        val_gen = ds.get_val(batch_size=config.batch_size)

    from ..data.prefetch import lookahead
    train_gen = lookahead(train_gen)
    with_normals = config.mode == 5
    hp = {"dtype": jnp.bfloat16, "gather_bf16": True} \
        if config.half_precision else {}
    if config.fast_step:
        # part of the fast-step bundle (FAST_STEP_KNOBS comment): cheaper
        # train-graph builds. EVAL paths keep the library default — the
        # fast-step fine-tune gate scores the resulting weights at default
        # eval settings. PARSENET_FAST_KNN_RECALL=0 is the gate-fallback
        # escape hatch: strides-only bundle with default-recall graphs.
        hp["knn_recall"] = float(os.environ.get("PARSENET_FAST_KNN_RECALL",
                                                FAST_KNN_RECALL))
    model = PrimitivesEmbedding(emb_size=128, num_primitives=10,
                                mode=5 if with_normals else 0,
                                k=config.knn_k, **hp)
    rng = jax.random.PRNGKey(config.seed)
    cdim = 6 if with_normals else 3
    sample = jnp.zeros((config.batch_size, 256, cdim))
    state = create_state(model, rng, (sample,), optimizer=config.optim,
                         weight_decay=config.weight_decay)
    if pretrained_params is None and config.pretrain_model_path:
        # fine-tune from the pretrained segmentation checkpoint
        # (reference: train_parsenet_e2e.py:82-84)
        pc = Checkpointer(
            f"{config.log_dir}/checkpoints/{config.pretrain_model_path}")
        if pc.latest_step() is not None:
            restored = pc.restore({"params": state.params})
            pretrained_params = restored["params"]
            log.info("loaded pretrained segmentation params from %s",
                     config.pretrain_model_path)
    if pretrained_params is not None:
        state = state.replace(params=pretrained_params)
    state = replicate(mesh, state)

    spline_fit = build_spline_fit(config.grid_size, open_vars=open_vars,
                                  closed_vars=closed_vars,
                                  log_dir=config.log_dir)
    num_accum = max(config.accum, 1)  # reference e2e accumulates 5 steps
    step_kw = dict(FAST_STEP_KNOBS) if config.fast_step else {}
    if config.fast_step:
        log.info("fast_step: %s", step_kw)
    train_step, eval_step = make_e2e_step(model, spline_fit, lamb=lamb,
                                          with_normals=with_normals,
                                          num_accum=num_accum, **step_kw)
    ckpt = Checkpointer(f"{config.log_dir}/checkpoints/{config.model_path}")
    host_rng = np.random.RandomState(config.seed + 1)
    key = jax.random.PRNGKey(config.seed + 3)
    steps_per_epoch = steps_per_epoch or max(
        config.num_train // (config.batch_size * num_accum), 1)
    lr = config.lr
    mlog = MetricsLogger(config.log_dir, config.model_path)

    # fixed validation sample (see docstring)
    val_batches = []
    if val_gen is not None and val_shapes:
        val_rng = np.random.RandomState(config.seed + 17)
        vp_n = val_points or points_per_shape
        for i in range(max(1, -(-val_shapes // config.batch_size))):
            vp, vl, vn, vpr = next(val_gen)
            vsel = val_rng.choice(vp.shape[1],
                                  min(vp_n, vp.shape[1]),
                                  replace=False)
            vx = (np.concatenate([vp[:, vsel], vn[:, vsel]], -1)
                  if with_normals else vp[:, vsel])
            val_batches.append((vx, vl[:, vsel], vpr[:, vsel],
                                jax.random.PRNGKey(config.seed + 1000 + i)))
    best_val_siou = -float("inf")

    for epoch in range(config.num_epochs):
        t0 = time.time()
        agg = []
        for it in range(steps_per_epoch):
            points, labels, normals, prim = next(train_gen)
            sel = host_rng.choice(points.shape[1],
                                  min(points_per_shape, points.shape[1]),
                                  replace=False)
            x = np.concatenate([points[:, sel], normals[:, sel]], -1) \
                if with_normals else points[:, sel]
            lab, pr = labels[:, sel], prim[:, sel]
            key, sub = jax.random.split(key)
            if num_accum > 1:
                # [A*B, ...] -> [A, B, ...] micro-batches; shard the B axis
                from jax.sharding import NamedSharding, PartitionSpec as P
                from ..parallel.mesh import DATA_AXIS
                A, B = num_accum, x.shape[0] // num_accum
                x = x.reshape(A, B, *x.shape[1:])
                lab = lab.reshape(A, B, -1)
                pr = pr.reshape(A, B, -1)
                bsh = NamedSharding(mesh, P(None, DATA_AXIS))
            else:
                bsh = batch_sharding(mesh)
            state, metrics = train_step(state, jax.device_put(x, bsh),
                                        jax.device_put(lab, bsh),
                                        jax.device_put(pr, bsh),
                                        sub, jnp.float32(lr))
            agg.append(metrics)
            step = int(state.step)
            if step % 2000 == 0:  # periodic save (reference: e2e :298-306)
                ckpt.save(step, jax.device_get({"params": state.params}))
        tr = {k: float(np.mean([float(m[k]) for m in agg])) for k in agg[0]}
        if val_gen is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            vals = []
            bsh = batch_sharding(mesh)
            if val_batches:
                for vx, vl_s, vpr_s, vkey in val_batches:
                    m = eval_step(state, jax.device_put(vx, bsh),
                                  jax.device_put(vl_s, bsh),
                                  jax.device_put(vpr_s, bsh), vkey)
                    vals.append({k: float(v) for k, v in m.items()})
            else:
                for _ in range(val_steps):
                    vp, vl, vn, vpr = next(val_gen)
                    vsel = host_rng.choice(vp.shape[1],
                                           min(points_per_shape, vp.shape[1]),
                                           replace=False)
                    vx = (np.concatenate([vp[:, vsel], vn[:, vsel]], -1)
                          if with_normals else vp[:, vsel])
                    key, sub = jax.random.split(key)
                    m = eval_step(state, jax.device_put(vx, bsh),
                                  jax.device_put(vl[:, vsel], bsh),
                                  jax.device_put(vpr[:, vsel], bsh), sub)
                    vals.append({k: float(v) for k, v in m.items()})
            tr["val_res_loss"] = float(np.mean([v["res_loss"] for v in vals]))
            tr["val_seg_iou"] = float(np.mean([v["seg_iou"] for v in vals]))
        log.info("epoch %d res %.4f (geom %.4f spline %.4f) embed %.4f "
                 "siou %.3f piou %.3f clusters %.1f%s (%.1fs)", epoch,
                 tr["res_loss"], tr["geom_loss"], tr["spline_loss"],
                 tr["embed_loss"], tr["seg_iou"], tr["prim_iou"],
                 tr["clusters"],
                 (f" | val res {tr['val_res_loss']:.4f} siou "
                  f"{tr['val_seg_iou']:.3f}" if "val_res_loss" in tr else ""),
                 time.time() - t0)
        mlog.log(epoch, tr)
        if val_batches:
            # save only on fixed-val seg-IoU improvement: the manager keeps
            # recent saves, so the LATEST step is always the BEST epoch —
            # exactly what bench.py / validate_reference.py restore
            if tr["val_seg_iou"] > best_val_siou:
                best_val_siou = tr["val_seg_iou"]
                ckpt.save(int(state.step),
                          jax.device_get({"params": state.params}))
        else:
            ckpt.save(int(state.step), jax.device_get({"params": state.params}))
    ckpt.wait()
    return state
