"""Segmentation metrics and matching (fixed-shape, on-device).

TPU-native equivalents of reference src/segment_utils.py. The reference's
numpy `unique` / boolean-indexing loops become masked dense ops over a fixed
K_max=50 segment axis, so SIOU and matching run inside jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .hungarian import solve_lap
from ..core.guards import highest_precision

K_MAX = 50  # max segments per shape (reference: src/segment_utils.py:283)


def to_one_hot(labels: jnp.ndarray, k_max: int = K_MAX) -> jnp.ndarray:
    """[N] int -> [N, k_max] one-hot float (reference: src/segment_utils.py:283-292)."""
    return jax.nn.one_hot(labels, k_max, dtype=jnp.float32)


@highest_precision
def relaxed_iou(pred_one_hot: jnp.ndarray, gt_one_hot: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU cost matrix between segmentations.

    pred/gt: [N, K] one-hot (or soft) memberships -> [K, K] IoU
    (reference: src/segment_utils.py:356-374 relaxed_iou_fast).
    """
    dots = jnp.dot(pred_one_hot.T, gt_one_hot,
                   preferred_element_type=jnp.float32)
    norms_p = jnp.sum(pred_one_hot, axis=0)[:, None]
    norms_g = jnp.sum(gt_one_hot, axis=0)[None, :]
    return dots / (norms_p + norms_g - dots + 1e-7)


def match(gt_labels: jnp.ndarray, pred_labels: jnp.ndarray,
          k_max: int = K_MAX) -> jnp.ndarray:
    """Hungarian matching of predicted to GT segments on relaxed-IoU cost.

    Returns col_of_row [k_max]: for predicted segment r, the matched GT
    segment id (reference: src/fitting_utils.py:362-376 `match`). Runs fully
    on device via the auction solver.
    """
    cost = 1.0 - relaxed_iou(to_one_hot(pred_labels, k_max),
                             to_one_hot(gt_labels, k_max))
    return solve_lap(cost)


def remap_primitive_labels(prim: jnp.ndarray) -> jnp.ndarray:
    """Eval-time taxonomy collapse {0,6,7}->9 (closed spline), 8->2 (open)
    (reference: src/segment_utils.py:154-163)."""
    p = jnp.where((prim == 0) | (prim == 6) | (prim == 7), 9, prim)
    return jnp.where(p == 8, 2, p)


@highest_precision
def primitive_type_per_segment(prim_one_hot: jnp.ndarray,
                               weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted vote for the primitive type of each predicted segment.

    prim_one_hot: [N, L] per-point type scores; weights: [N, K] memberships.
    Returns [K] argmax type (reference: src/segment_utils.py:256-264).
    """
    votes = jnp.dot(prim_one_hot.T, weights, preferred_element_type=jnp.float32)
    return jnp.argmax(votes, axis=0)


@functools.partial(jax.jit, static_argnames=("k_max", "min_gt_points"))
def siou_matched_segments(gt_labels: jnp.ndarray, pred_labels: jnp.ndarray,
                          pred_prim_per_point: jnp.ndarray,
                          gt_prim_per_point: jnp.ndarray,
                          weights: jnp.ndarray,
                          k_max: int = K_MAX, min_gt_points: int = 100):
    """Segment IoU + primitive-type IoU over Hungarian-matched segments.

    Mirrors reference src/segment_utils.py:139-242: match on relaxed IoU,
    average per-pair IoU over pairs where both sides are non-empty and the GT
    segment has >= min_gt_points points; primitive-type accuracy over the
    same matched pairs, with the eval taxonomy collapse applied.

    gt_labels, pred_labels: [N] ints; pred_prim_per_point: [N] int predicted
    type; gt_prim_per_point: [N] int; weights: [N, K] segment memberships
    (used for the per-segment type vote).
    Returns (seg_iou, prim_iou) scalars.
    """
    gt_prim = remap_primitive_labels(gt_prim_per_point)
    pred_prim = remap_primitive_labels(pred_prim_per_point)

    gt_oh = to_one_hot(gt_labels, k_max)
    pred_oh = to_one_hot(pred_labels, k_max)
    cost = 1.0 - relaxed_iou(pred_oh, gt_oh)
    col_of_row = solve_lap(cost)  # pred segment r -> gt segment col_of_row[r]

    pred_counts = jnp.sum(pred_oh, axis=0)            # [K]
    gt_counts = jnp.sum(gt_oh, axis=0)                # [K]
    inter = jnp.dot(pred_oh.T, gt_oh,
                    preferred_element_type=jnp.float32)  # [K, K]

    r = jnp.arange(k_max)
    c = col_of_row
    pair_inter = inter[r, c]
    pair_union = pred_counts + gt_counts[c] - pair_inter
    iou = pair_inter / (pair_union + 1e-8)

    valid = (pred_counts > 0) & (gt_counts[c] >= min_gt_points)
    seg_iou = jnp.sum(iou * valid) / (jnp.sum(valid) + 1e-8)

    # per-segment predicted type via weighted vote over the 10 classes,
    # on the REMAPPED per-point types (reference applies the remap before
    # the vote: segment_utils.py:155-176)
    prim_oh = jax.nn.one_hot(pred_prim, 10, dtype=jnp.float32)
    seg_pred_type = primitive_type_per_segment(prim_oh, weights)  # [K]

    # GT segment type: majority type among points of that GT segment
    gt_prim_oh = jax.nn.one_hot(gt_prim, 10, dtype=jnp.float32)
    gt_votes = jnp.dot(gt_oh.T, gt_prim_oh,
                       preferred_element_type=jnp.float32)  # [K, 10]
    gt_seg_type = jnp.argmax(gt_votes, axis=1)

    type_match = (seg_pred_type == gt_seg_type[c]).astype(jnp.float32)
    prim_iou = jnp.sum(type_match * valid) / (jnp.sum(valid) + 1e-8)
    return seg_iou, prim_iou


def mean_iou_per_class(gt: jnp.ndarray, pred_logits: jnp.ndarray,
                       num_classes: int = 10) -> jnp.ndarray:
    """Per-class IoU averaged over classes and batch (reference:
    src/segment_loss.py:127-148 evaluate_miou).

    gt: [B, N] int; pred_logits: [B, N, C] -> scalar mIoU.
    """
    pred = jnp.argmax(pred_logits, axis=-1)
    eps = jnp.finfo(jnp.float32).eps

    def one_class(c):
        g = gt == c
        p = pred == c
        i = jnp.sum(g & p, axis=-1) + eps
        u = jnp.sum(g | p, axis=-1) + eps
        return i / u

    ious = jax.vmap(one_class)(jnp.arange(num_classes))  # [C, B]
    return jnp.mean(ious)
