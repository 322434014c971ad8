"""Auxiliary evaluation metrics.

Equivalents of reference src/eval_utils.py: SPFN-style p-coverage, split
geometric/spline residual aggregation, and label preprocessing for saved
prediction dicts.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def p_coverage(points: np.ndarray, surface_points: np.ndarray,
               threshold: float = 0.01) -> float:
    """Fraction of input points within `threshold` of any predicted surface
    sample (reference: src/eval_utils.py:103-127)."""
    d = np.sqrt(((points[:, None] - surface_points[None]) ** 2).sum(-1).min(1))
    return float((d < threshold).mean())


def separate_losses_np(distances: Dict[int, float],
                       seg_types: Dict[int, str],
                       lamb: float = 1.0):
    """Split residuals into geometric vs spline means with the degenerate
    clamp (reference: src/eval_utils.py:130-175 / residual_utils.py:333-378)."""
    geom, spline, total = [], [], []
    for k, d in distances.items():
        if d is None:
            continue
        d = 0.1 if d > 1.0 else float(d)
        if seg_types[k] in ("open-spline", "closed-spline"):
            spline.append(d)
            total.append(d * lamb)
        else:
            geom.append(d)
            total.append(d)
    return (float(np.mean(total)) if total else 0.0,
            float(np.mean(geom)) if geom else None,
            float(np.mean(spline)) if spline else None)


def remove_unassigned(labels: np.ndarray, points: np.ndarray,
                      unassigned_value: int = 100) -> np.ndarray:
    """Assign label-`unassigned_value` points to the label of the nearest
    assigned point (reference: src/eval_utils.py:265-295)."""
    labels = labels.copy()
    bad = labels == unassigned_value
    if not bad.any() or bad.all():
        return labels
    good_idx = np.where(~bad)[0]
    d = ((points[bad][:, None] - points[good_idx][None]) ** 2).sum(-1)
    labels[bad] = labels[good_idx[np.argmin(d, axis=1)]]
    return labels


def iou_one_sample(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> float:
    """Mean per-class IoU for one shape (reference: src/eval_utils.py:8-40)."""
    eps = np.finfo(np.float32).eps
    acc = 0.0
    for c in range(num_classes):
        i = np.logical_and(pred == c, gt == c).sum() + eps
        u = np.logical_or(pred == c, gt == c).sum() + eps
        acc += i / u
    return float(acc / num_classes)


def compute_stats(shapes, max_surfaces: Optional[int] = None,
                  max_control_points: Optional[int] = None):
    """Filter ABC shapes by surface / control-point counts and strip heavy
    fields (reference: src/data_utils.py:4-46). `shapes` is a list of dicts
    with 'surfaces' entries carrying optional 'points'/'control_points'."""
    kept = []
    for sh in shapes:
        surfs = sh.get("surfaces", [])
        if max_surfaces is not None and len(surfs) > max_surfaces:
            continue
        if max_control_points is not None:
            cp_counts = [np.asarray(s.get("control_points", [])).size // 3
                         for s in surfs]
            if cp_counts and max(cp_counts) > max_control_points:
                continue
        slim = {k: v for k, v in sh.items() if k != "surfaces"}
        slim["surfaces"] = [
            {k: v for k, v in s.items() if k not in ("points", "normals")}
            for s in surfs]
        kept.append(slim)
    return kept


def iou_from_embeddings(embedding, gt_labels, quantile: float = 0.015,
                        iterations: int = 30, key=None):
    """Cluster an embedding with mean-shift and report the matched segment
    IoU (reference: src/test_utils.py:36-60 IOU_from_embeddings)."""
    import jax
    import jax.numpy as jnp

    from ..ops.mean_shift import guard_mean_shift
    from ..ops.segmentation import siou_matched_segments, to_one_hot

    key = key if key is not None else jax.random.PRNGKey(0)
    emb = jnp.asarray(embedding)
    emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
    ms = guard_mean_shift(emb, quantile, key=key, iterations=iterations)
    gt = jnp.asarray(gt_labels)
    dummy_prim = jnp.zeros_like(gt)
    s_iou, _ = siou_matched_segments(gt, ms.labels, dummy_prim, dummy_prim,
                                     to_one_hot(ms.labels))
    return float(s_iou), np.asarray(ms.labels)
