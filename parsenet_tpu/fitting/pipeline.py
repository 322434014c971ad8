"""Masked per-shape fitting pipeline (train-time residual loss).

TPU-native re-design of reference src/residual_utils.py:86-208
(Evaluation.fitting_loss / residual_train_mode) + src/primitive_forward.py:
925-1047 (fit_one_shape_torch). The reference's per-segment Python loop with
host round-trips (lapsolver matching, scipy mode, numpy NMS) becomes one
fixed-shape program:

* mean-shift -> cluster centers -> soft membership weights  [K_MAX, N]
* on-device Hungarian match of clusters to GT segments
* per-cluster GT primitive type via one-hot vote (scipy.stats.mode equiv)
* all geometric primitives fitted to every cluster in one vmapped batch on a
  stride-4 subsample (the reference's double stride-2), residuals evaluated
  on the matched GT segment's points via masks
* up to SPLINE_SLOTS spline segments (the reference's 4-spline training cap,
  primitive_forward.py:955-961) run through the frozen SplineNet decoders on
  the stride-2 cloud with soft weights; surfaces sampled with constant basis
  matrices; chamfer residual against the GT segment
* separate_losses semantics: residual > 1 clamped to 0.1 (degenerate),
  spline residuals scaled by lamb, mean over valid segments
  (reference: residual_utils.py:333-378).

Everything is differentiable end-to-end exactly where the reference is
(through mean-shift, membership weights, fits, and the spline decoders).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.guards import EPS, guard_exp
from ..ops.chamfer import min_sqdist
from ..ops.hungarian import solve_lap
from ..ops.mean_shift import MeanShiftResult, guard_mean_shift
from ..ops.primitive_dist import geom_type_from_label, residual_select
from ..ops.primitive_fits import fit_all_primitives_shared_points
from ..ops.segmentation import (K_MAX, relaxed_iou, siou_matched_segments,
                                to_one_hot)
from ..ops.standardize import standardize_points, unstandardize_points
from ..ops.bspline import close_control_grid, sample_surface

SPLINE_SLOTS = 4  # reference trains at most 4 spline fits per shape
SPLINE_LABELS_OPEN = (2, 8)
SPLINE_LABELS_CLOSED = (0, 6, 7, 9)


class FittingLossOut(NamedTuple):
    loss: jnp.ndarray            # scalar residual loss
    geom_loss: jnp.ndarray       # mean residual over geometric segments
    spline_loss: jnp.ndarray     # mean residual over spline segments
    seg_iou: jnp.ndarray
    prim_iou: jnp.ndarray
    num_clusters: jnp.ndarray


def weights_normalize(weights: jnp.ndarray, bw: jnp.ndarray,
                      valid: jnp.ndarray) -> jnp.ndarray:
    """Mean-shift-kernel softmax over clusters + per-cluster max-1 rescale
    (reference: src/fitting_utils.py:306-325). weights: [K, N] dot products,
    valid: [K] row mask."""
    z = weights / (bw ** 2) / 2.0
    z = jnp.where(valid[:, None], z, -jnp.inf)
    prob = guard_exp(z)
    prob = prob / (jnp.sum(prob, axis=0, keepdims=True) + EPS)
    # max-1 normalization per cluster row
    prob = prob - jnp.min(prob, axis=1, keepdims=True)
    prob = prob / (jnp.max(prob, axis=1, keepdims=True) + EPS)
    return jnp.where(valid[:, None], prob, 0.0)


def cluster_centers(ms: MeanShiftResult, embedding: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense [K_MAX, D] center matrix (index order, like the reference's
    new_X[unique centers]) + validity mask [K_MAX]."""
    order = jnp.argsort(1 - ms.center_mask, stable=True)  # centers first
    centers = ms.shifted[order[:K_MAX]]
    valid = jnp.arange(K_MAX) < ms.num_clusters
    return jnp.where(valid[:, None], centers, 0.0), valid


def gt_segment_prim_votes(gt_labels: jnp.ndarray, gt_prim: jnp.ndarray
                          ) -> jnp.ndarray:
    """[K_MAX, 10] one-hot vote table: majority primitive type per GT segment
    (replaces scipy.stats.mode, reference residual_utils.py:187)."""
    seg_oh = to_one_hot(gt_labels)                      # [N, K]
    prim_oh = jax.nn.one_hot(gt_prim, 10, dtype=jnp.float32)
    return jnp.dot(seg_oh.T, prim_oh, preferred_element_type=jnp.float32)


def make_spline_apply(open_model, open_vars, closed_model, closed_vars,
                      nu, nv, nu_c, nv_c) -> Callable:
    """Returns spline_fit(points2 [M,3], w [M], is_closed) -> surface [S, 3].

    Frozen decoders in eval mode (the reference freezes the pretrained
    SplineNets during e2e training, residual_utils.py:50-66). Standardize ->
    decode control grid -> (closed: wrap u row) -> sample with basis
    matrices -> unstandardize (reference primitive_forward.py:34-85,347-397).
    """
    grid = open_model.grid

    def run_open(args):
        pts, w = args
        st = standardize_points(pts, w)
        cp = open_model.apply(open_vars, st.points[None], weights=w[None],
                              train=False)[0]
        cp = cp.reshape(grid, grid, 3)
        surf = sample_surface(nu, nv, cp)
        return unstandardize_points(surf, st)

    def run_closed(args):
        pts, w = args
        st = standardize_points(pts, w)
        cp = closed_model.apply(closed_vars, st.points[None], weights=w[None],
                                train=False)[0]
        cp = cp.reshape(grid, grid, 3)
        cp = close_control_grid(cp)  # wrap-around row [G+1, G, 3]
        surf = sample_surface(nu_c, nv_c, cp)
        return unstandardize_points(surf, st)

    def spline_fit(points2, w, is_closed):
        return lax.cond(is_closed, run_closed, run_open, (points2, w))

    def spline_fit_batched(points_s, w_s, is_closed_s):
        """All slots at once: points_s [S, M, 3], w_s [S, M], is_closed [S].

        Runs BOTH decoders vmapped over the slot axis and selects per slot —
        2x the decoder FLOPs of the sequential lax.cond version, but the
        batching fills the chip far better than S sequential tiny decodes
        (and under vmap a cond would run both branches anyway).
        """
        sts = jax.vmap(standardize_points)(points_s, w_s)
        cp_o = open_model.apply(open_vars, sts.points, weights=w_s,
                                train=False)
        cp_o = cp_o.reshape(-1, grid, grid, 3)
        surf_o = sample_surface(nu, nv, cp_o)
        cp_c = closed_model.apply(closed_vars, sts.points, weights=w_s,
                                  train=False)
        cp_c = close_control_grid(cp_c.reshape(-1, grid, grid, 3))
        surf_c = sample_surface(nu_c, nv_c, cp_c)
        surf = jnp.where(is_closed_s[:, None, None], surf_c, surf_o)
        return jax.vmap(unstandardize_points)(surf, sts)

    def spline_fit_batched_eval(pts1800, is_closed_s):
        """Eval-mode slots with the reference's per-type point counts:
        pts1800 [S, 1800, 3] preprocessed segment points (ops.preprocess);
        open decoders consume the first 1500 rows, closed all 1800
        (reference upsample targets, primitive_forward.py:996,1035).
        Weights are all ones at eval (hard memberships)."""
        S = pts1800.shape[0]
        pts_open = pts1800[:, :1500]
        w_o = jnp.ones((S, pts_open.shape[1]))
        w_c = jnp.ones((S, pts1800.shape[1]))
        sts_o = jax.vmap(standardize_points)(pts_open, w_o)
        cp_o = open_model.apply(open_vars, sts_o.points, weights=w_o,
                                train=False)
        surf_o = sample_surface(nu, nv, cp_o.reshape(-1, grid, grid, 3))
        surf_o = jax.vmap(unstandardize_points)(surf_o, sts_o)
        sts_c = jax.vmap(standardize_points)(pts1800, w_c)
        cp_c = closed_model.apply(closed_vars, sts_c.points, weights=w_c,
                                  train=False)
        cp_c = close_control_grid(cp_c.reshape(-1, grid, grid, 3))
        surf_c = sample_surface(nu_c, nv_c, cp_c)
        surf_c = jax.vmap(unstandardize_points)(surf_c, sts_c)
        return jnp.where(is_closed_s[:, None, None], surf_c, surf_o)

    spline_fit.batched = spline_fit_batched
    spline_fit.batched_eval = spline_fit_batched_eval
    return spline_fit


def fitting_loss_shape(points: jnp.ndarray, normals: jnp.ndarray,
                       embedding: jnp.ndarray, gt_labels: jnp.ndarray,
                       gt_prim: jnp.ndarray, key: jax.Array,
                       pred_prim_per_point: Optional[jnp.ndarray] = None,
                       spline_fit: Optional[Callable] = None,
                       quantile: float = 0.025, iterations: int = 5,
                       lamb: float = 1.0,
                       ms_num_samples: int = 5000,
                       spline_stride: int = 2,
                       residual_stride: int = 1,
                       siou_stride: int = 1,
                       ms_attempt_iterations: Optional[int] = None,
                       ms_attempt_pallas: bool = False,
                       ablate: Tuple[str, ...] = ()) -> FittingLossOut:
    """Train-time residual loss for ONE shape.

    points/normals: [N, 3]; embedding: [N, D] raw (normalized here);
    gt_labels: [N] int segment ids (< K_MAX); gt_prim: [N] int types;
    pred_prim_per_point: [N] argmax of the primitive head (for the SIOU
    metric; falls back to GT types when absent).

    Perf knobs (round-5 train-step speedup; each is a strict superset of
    the reference's own subsampling, quality-gated before becoming a
    trainer default):
      spline_stride: stride of the cloud fed to the frozen SplineNet
        decoders (default 2 = reference's per-segment stride-2,
        primitive_forward.py:963-968; our decoders see the WHOLE strided
        cloud with soft weights, so stride 4 still feeds them more points
        than the reference's per-segment slices).
      residual_stride: stride of the points on which residual distances
        and spline chamfer are evaluated (the reference evaluates
        residuals on the SAME strided per-segment points it fits on —
        fit_one_shape_torch collects `points[ids][::2]` into `data` and
        ResidualLoss consumes that — so stride 2 here is reference parity;
        the historical default 1 evaluates on the full cloud).
      siou_stride: stride for the train-time SIOU metric (metrics only,
        never touches the loss or its gradients).
      ms_attempt_iterations / ms_attempt_pallas: cheaper stop-gradient
        bandwidth-escalation attempts inside guard_mean_shift (the
        accepted differentiable re-run always uses full `iterations`).

    ablate: static tuple used ONLY by scripts/bench_train.py for in-context
    stage costing (the bench.py BENCH_ABLATE pattern — standalone stage
    timing is unreliable over the tunneled runtime). "ms" replaces
    mean-shift + matching with GT-derived clusters, "match" replaces the
    LAP with identity assignment, "fits" zeroes the geometric fit +
    residual stage, "siou" skips the SIOU metric. Production entry points
    never set it.
    """
    N = points.shape[0]
    emb = embedding / (jnp.linalg.norm(embedding, axis=-1, keepdims=True) + 1e-12)
    gt_oh = to_one_hot(gt_labels)
    gt_count = jnp.sum(gt_oh, axis=0)
    if "ms" in ablate:
        # GT-cluster stub: centers = per-GT-segment mean embedding; the
        # rest of the pipeline sees the same shapes/dtypes as mean-shift
        # output, so (full - this) prices mean-shift + matching exactly
        centers = jnp.dot(gt_oh.T, emb,
                          preferred_element_type=jnp.float32)
        centers = centers / (gt_count[:, None] + EPS)
        # sqrt(sum+eps) not linalg.norm: empty GT segments give all-zero
        # rows, and norm's gradient at exactly 0 is NaN (0/0)
        centers = centers / jnp.sqrt(
            jnp.sum(centers * centers, axis=-1, keepdims=True) + 1e-12)
        valid_k = gt_count > 0
        ms = MeanShiftResult(labels=gt_labels.astype(jnp.int32), shifted=emb,
                             center_mask=jnp.zeros((N,), bool),
                             bandwidth=jnp.float32(0.1),
                             num_clusters=jnp.sum(valid_k))
        cols = jnp.arange(K_MAX)
    else:
        ms = guard_mean_shift(emb, quantile, key=key,
                              num_samples=ms_num_samples,
                              iterations=iterations,
                              attempt_iterations=ms_attempt_iterations,
                              use_pallas=ms_attempt_pallas)
        centers, valid_k = cluster_centers(ms, emb)
        if "match" in ablate:
            cols = jnp.arange(K_MAX)
        else:
            # on-device Hungarian: predicted cluster k -> GT segment cols[k]
            cost = 1.0 - relaxed_iou(to_one_hot(ms.labels),
                                     to_one_hot(gt_labels))
            cols = solve_lap(lax.stop_gradient(cost))
    weights_raw = jnp.dot(centers, emb.T, preferred_element_type=jnp.float32)

    pred_oh = to_one_hot(ms.labels)
    pred_count = jnp.sum(pred_oh, axis=0)
    valid = valid_k & (pred_count > 0) & (gt_count[cols] > 0)

    votes = gt_segment_prim_votes(gt_labels, gt_prim)   # [K, 10]
    seg_label = jnp.argmax(votes[cols], axis=1)         # [K] GT-mode type

    w_norm = weights_normalize(weights_raw, ms.bandwidth, valid)  # [K, N]

    gt_mask = (gt_labels[None, :] == cols[:, None]).astype(jnp.float32)
    # residual-evaluation subsample (reference evaluates residuals on the
    # same strided per-segment points it fits on; stride 1 = full cloud)
    p_res = points[::residual_stride]
    gt_mask_res = gt_mask[:, ::residual_stride]
    if "fits" in ablate:
        geom_res = jnp.zeros((K_MAX,))
    else:
        # ---- geometric fits on the stride-4 subsample (reference 2x2)
        p4, n4, w4 = points[::4], normals[::4], w_norm[:, ::4] + EPS
        params = fit_all_primitives_shared_points(p4, n4, w4)
        geom_type = geom_type_from_label(seg_label)
        dists = residual_select(p_res, params, geom_type)  # [K, N/rs]
        geom_res = jnp.sum(dists * gt_mask_res, axis=1) / (
            jnp.sum(gt_mask_res, axis=1) + EPS)

    is_spline = jnp.isin(seg_label, jnp.asarray(
        SPLINE_LABELS_OPEN + SPLINE_LABELS_CLOSED))
    is_closed = jnp.isin(seg_label, jnp.asarray(SPLINE_LABELS_CLOSED))
    is_geom = valid & ~is_spline

    # ---- spline slots (cap SPLINE_SLOTS, encounter order like the reference)
    spline_valid_seg = valid & is_spline
    spline_rank = jnp.cumsum(spline_valid_seg) - 1
    in_cap = spline_valid_seg & (spline_rank < SPLINE_SLOTS)
    slot_order = jnp.argsort(~in_cap, stable=True)       # flagged first
    slot_seg = slot_order[:SPLINE_SLOTS]                 # segment id per slot
    slot_valid = in_cap[slot_seg]

    spline_res = jnp.zeros((K_MAX,))
    if spline_fit is not None:
        p2 = points[::spline_stride]
        w2 = w_norm[:, ::spline_stride] + EPS

        def slot_chamfer(surf, seg):
            # chamfer: GT segment points <-> sampled surface (two-sided,
            # reference primitives.py:197-206 with reduce=True), on the
            # residual-evaluation subsample
            d_ps = min_sqdist(p_res[None], surf[None])[0]           # [N/rs]
            m = gt_mask_res[seg]
            d1 = jnp.sum(d_ps * m) / (jnp.sum(m) + EPS)
            d_sp = min_sqdist(surf[None], p_res[None],
                              x_mask=m[None])[0]                    # [S]
            d2 = jnp.mean(d_sp)
            return 0.5 * (d1 + d2)

        if hasattr(spline_fit, "batched"):
            pts_s = jnp.broadcast_to(
                p2, (SPLINE_SLOTS,) + p2.shape)
            surfs = spline_fit.batched(pts_s, w2[slot_seg],
                                       is_closed[slot_seg])
            slot_res = jax.vmap(slot_chamfer)(surfs, slot_seg)
        else:
            def run_slot(seg):
                surf = spline_fit(p2, w2[seg], is_closed[seg])
                return slot_chamfer(surf, seg)

            slot_res = lax.map(run_slot, slot_seg)
        spline_res = jnp.zeros((K_MAX,)).at[slot_seg].add(
            jnp.where(slot_valid, slot_res, 0.0))

    spline_used = jnp.zeros((K_MAX,), bool).at[slot_seg].set(slot_valid) \
        if spline_fit is not None else jnp.zeros((K_MAX,), bool)

    # ---- separate_losses: clamp degenerate residuals, lamb-scale splines
    res = jnp.where(spline_used, spline_res, geom_res)
    res = jnp.where(res > 1.0, 0.1, res)
    contributes = is_geom | spline_used
    scaled = jnp.where(spline_used, res * lamb, res)
    total = jnp.sum(scaled * contributes) / (jnp.sum(contributes) + EPS)
    g_loss = jnp.sum(res * is_geom) / (jnp.sum(is_geom) + EPS)
    s_loss = jnp.sum(res * spline_used) / (jnp.sum(spline_used) + EPS)

    # ---- metrics (no grad; siou_stride subsamples the metric only)
    if "siou" in ablate:
        seg_iou = prim_iou = jnp.mean(res) * 0.0
    else:
        ss = siou_stride
        pp = gt_prim if pred_prim_per_point is None else pred_prim_per_point
        seg_iou, prim_iou = siou_matched_segments(
            gt_labels[::ss], ms.labels[::ss], lax.stop_gradient(pp[::ss]),
            gt_prim[::ss], lax.stop_gradient(w_norm.T[::ss]))
    return FittingLossOut(total, g_loss, s_loss, seg_iou, prim_iou,
                          ms.num_clusters)
