"""Per-segment canonicalization before SplineNet.

TPU-native equivalent of reference src/fitting_utils.py:493-553
(standardize_points_torch): pick the confident subset of a weighted segment,
mean-center (gradient flows through the mean), rotate the minor principal
axis onto x (rotation detached, like the reference's numpy round-trip), and
scale by the weighted bbox extent (detached). Everything is masked and
fixed-shape so it vmaps over spline slots.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.guards import EPS
from .linalg import safe_eigh
from ..core.guards import highest_precision


class Standardization(NamedTuple):
    points: jnp.ndarray  # [N, 3] canonicalized
    mean: jnp.ndarray    # [3]
    R: jnp.ndarray       # [3, 3] applied rotation (x' = R x)
    std: jnp.ndarray     # [3] bbox scales


@highest_precision
def rotation_matrix_a_to_b(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Rotation with R @ A = B for unit 3-vectors
    (reference: src/fitting_utils.py:556-583)."""
    cos = jnp.dot(A, B)
    sin = jnp.linalg.norm(jnp.cross(B, A))
    u = A
    v = B - jnp.dot(A, B) * A
    v = v / (jnp.linalg.norm(v) + EPS)
    w = jnp.cross(B, A)
    w = w / (jnp.linalg.norm(w) + EPS)
    F = jnp.stack([u, v, w], axis=1)
    G = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    G = G.at[0, 0].set(cos).at[0, 1].set(-sin).at[1, 0].set(sin).at[1, 1].set(cos)
    # F is orthonormal when A, B are independent; pinv-style solve keeps the
    # degenerate A ~ B case finite.
    Finv = jnp.linalg.solve(F + 1e-8 * jnp.eye(3), jnp.eye(3))
    return F @ G @ Finv


@highest_precision
def standardize_points(points: jnp.ndarray, weights: jnp.ndarray,
                       conf_threshold: float = 0.8,
                       min_confident: int = 400) -> Standardization:
    """points: [N, 3], weights: [N] soft membership of this segment.

    Confident subset = weights > 0.8, falling back to the top quarter
    by weight when fewer than `min_confident` qualify
    (reference: src/fitting_utils.py:512-521).
    """
    n = points.shape[0]
    conf = (weights > conf_threshold).astype(jnp.float32)
    # fallback subset size: top quarter for big clouds, top half otherwise
    # (reference: fitting_utils.py:516-520)
    k = max(n // 4 if n >= 7500 else n // 2, 1)
    kth = jnp.sort(weights)[n - k]
    topk_mask = (weights >= kth).astype(jnp.float32)
    use_topk = jnp.sum(conf) < min_confident
    mask = jnp.where(use_topk, topk_mask, conf)

    w = (weights * mask)[:, None]
    wsum = jnp.sum(w) + EPS
    mean = jnp.sum(points * w, axis=0) / wsum  # gradient flows (reference kept it)
    centered = points - mean

    # detached PCA rotation (reference: numpy round-trip, no grad)
    sel = lax.stop_gradient(centered * mask[:, None])
    cov = jnp.dot(sel.T, sel, preferred_element_type=jnp.float32)
    _, U = safe_eigh(cov)
    smallest = U[:, 0]
    R = lax.stop_gradient(
        rotation_matrix_a_to_b(smallest, jnp.array([1.0, 0.0, 0.0])))
    rotated = (R @ centered.T).T

    # detached weighted-bbox scale over the confident subset
    wp = rotated * w
    big = 1e9
    masked_max = jnp.max(jnp.where(mask[:, None] > 0, wp, -big), axis=0)
    masked_min = jnp.min(jnp.where(mask[:, None] > 0, wp, big), axis=0)
    std = lax.stop_gradient(jnp.abs(masked_max - masked_min))
    out = rotated / (std[None, :] + EPS)
    return Standardization(out, mean, R, std)


@highest_precision
def unstandardize_points(points: jnp.ndarray, st: Standardization) -> jnp.ndarray:
    """Invert standardize_points for surface samples [M, 3]
    (reference: src/primitive_forward.py:58-64)."""
    p = points * (st.std[None, :] + EPS)
    p = (st.R.T @ p.T).T
    return p + st.mean
