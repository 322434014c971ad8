"""Weighted closed-form primitive fits (plane / sphere / cylinder / cone).

TPU-native re-design of reference src/primitive_forward.py:695-843. The
reference fits one segment at a time inside Python loops with per-segment
CUDA SVDs; here every fit is expressed on a single segment as pure batched
linalg and then `jax.vmap`-ed over [B*K_max] segments at once — one XLA call
for the whole shape batch. Degenerate segments (weight mass ~ 0) produce
finite garbage that downstream losses mask out; gradients stay bounded via
`safe_eigh` / ridge terms.

Conventions: points [N, 3], normals [N, 3], weights [N] (soft membership,
zero for padded/invalid points). Every function returns a tuple of parameter
arrays (no dicts) so results stack cleanly under vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.guards import EPS, guard_sqrt, highest_precision
from .linalg import ridge_lstsq, smallest_eigvec


class PlaneParams(NamedTuple):
    normal: jnp.ndarray  # [..., 3] unit
    offset: jnp.ndarray  # [...] plane is {p : <normal, p> = offset}


class SphereParams(NamedTuple):
    center: jnp.ndarray  # [..., 3]
    radius: jnp.ndarray  # [...]


class CylinderParams(NamedTuple):
    axis: jnp.ndarray    # [..., 3] unit
    center: jnp.ndarray  # [..., 3] point on the axis (in the projection plane)
    radius: jnp.ndarray  # [...]


class ConeParams(NamedTuple):
    apex: jnp.ndarray    # [..., 3]
    axis: jnp.ndarray    # [..., 3] unit, pointing into the cone
    theta: jnp.ndarray   # [...] half-angle


@highest_precision
def fit_plane(points: jnp.ndarray, weights: jnp.ndarray) -> PlaneParams:
    """Weighted plane fit (reference: src/primitive_forward.py:708-729).

    normal = smallest eigenvector of (w X)^T (w X) with X mean-centered;
    offset d = sum w <normal, p> / sum w.
    """
    w = weights[:, None]
    wsum = jnp.sum(w) + EPS
    centroid = jnp.sum(w * points, axis=0) / wsum
    X = (points - centroid) * w
    M = jnp.dot(X.T, X, preferred_element_type=jnp.float32)
    a = smallest_eigvec(M)
    d = jnp.sum(w[:, 0] * jnp.dot(points, a)) / wsum
    return PlaneParams(a, d)


@highest_precision
def fit_sphere(points: jnp.ndarray, weights: jnp.ndarray,
               lam: float = 1e-6) -> SphereParams:
    """Weighted sphere fit via linear least squares for the center
    (reference: src/primitive_forward.py:746-769), then the weighted RMS
    radius. Mirrors the reference's double weighting of the linear system.
    """
    w = weights[:, None]
    wsum = jnp.sum(w) + EPS
    A = 2.0 * (-points + jnp.sum(points * w, axis=0) / wsum)
    dot = w * jnp.sum(points * points, axis=1, keepdims=True)
    Y = dot - jnp.sum(dot) / wsum
    A = w * A
    Y = w * Y
    center = -ridge_lstsq(A, Y, lam)[:, 0]
    r2 = jnp.sum(weights * jnp.sum((points - center) ** 2, axis=1)) / wsum
    radius = guard_sqrt(jnp.clip(r2, min=1e-3))
    return SphereParams(center, radius)


@highest_precision
def fit_cylinder(points: jnp.ndarray, normals: jnp.ndarray,
                 weights: jnp.ndarray) -> CylinderParams:
    """Weighted cylinder fit (reference: src/primitive_forward.py:784-806).

    axis = smallest eigenvector of (w N)^T (w N) (normals of a cylinder span
    the plane perpendicular to the axis); project points onto that plane and
    fit a sphere there for (center, radius).
    """
    w = weights[:, None]
    WN = normals * w
    a = smallest_eigvec(jnp.dot(WN.T, WN, preferred_element_type=jnp.float32))
    a = a / (jnp.linalg.norm(a) + EPS)
    prj = points - jnp.dot(points, a)[:, None] * a[None, :]
    center, _ = fit_sphere(prj, weights)
    # the projected circle lies exactly in the plane through the origin
    # perpendicular to `a`; remove any ridge-ambiguous drift of the center
    # along `a` (rank-deficient direction) and recompute the radius in-plane.
    center = center - jnp.dot(center, a) * a
    wsum = jnp.sum(weights) + EPS
    r2 = jnp.sum(weights * jnp.sum((prj - center) ** 2, axis=1)) / wsum
    radius = guard_sqrt(jnp.clip(r2, min=1e-6))
    return CylinderParams(a, center, radius)


@highest_precision
def fit_cone(points: jnp.ndarray, normals: jnp.ndarray,
             weights: jnp.ndarray) -> ConeParams:
    """Weighted cone fit (reference: src/primitive_forward.py:808-843).

    apex c solves the normal-plane system  <n_i, c> = <n_i, p_i>  in weighted
    LS; axis a = plane-fit normal of the surface normals, flipped to point
    into the cone; half-angle = weighted mean angle between (p - c) and a.
    """
    w = weights[:, None]
    A = w * normals
    Y = w * jnp.sum(normals * points, axis=1, keepdims=True)
    apex = ridge_lstsq(A, Y, 1e-4)[:, 0]
    a, _ = fit_plane(normals, weights)
    # weighted flip: the reference sums over the segment's own normals only
    # (src/primitive_forward.py:826-829); with shared-cloud weighting the sum
    # must be weighted or other segments' normals can flip the axis
    flip = jnp.where(jnp.sum(weights * jnp.dot(normals, a)) > 0, -1.0, 1.0)
    a = a * flip
    diff = points - apex
    diff = diff / (jnp.linalg.norm(diff, axis=1, keepdims=True) + EPS)
    cosang = jnp.clip(jnp.abs(jnp.dot(diff, a)), max=0.999)
    theta = jnp.sum(weights * jnp.arccos(cosang)) / (jnp.sum(weights) + EPS)
    theta = jnp.clip(theta, 1e-3, jnp.pi / 2 - 1e-3)
    return ConeParams(apex, a, theta)


class AllPrimParams(NamedTuple):
    """Parameters of all four geometric primitives fit to each segment."""
    plane: PlaneParams
    sphere: SphereParams
    cylinder: CylinderParams
    cone: ConeParams


def fit_all_primitives(points: jnp.ndarray, normals: jnp.ndarray,
                       weights: jnp.ndarray) -> AllPrimParams:
    """Fit every geometric primitive type to one weighted segment.

    Fitting all four types costs a handful of 3x3 solves per segment —
    negligible next to the network — and lets the per-segment type dispatch
    of the reference (src/primitive_forward.py:925-1047) become a cheap
    elementwise select instead of data-dependent control flow.
    """
    return AllPrimParams(
        plane=fit_plane(points, weights),
        sphere=fit_sphere(points, weights),
        cylinder=fit_cylinder(points, normals, weights),
        cone=fit_cone(points, normals, weights),
    )


# vmapped variants over a leading segment axis: points [K, N, 3], etc.
fit_plane_batched = jax.vmap(fit_plane)
fit_sphere_batched = jax.vmap(fit_sphere)
fit_cylinder_batched = jax.vmap(fit_cylinder)
fit_cone_batched = jax.vmap(fit_cone)
fit_all_primitives_batched = jax.vmap(fit_all_primitives)


def fit_all_primitives_shared_points(points: jnp.ndarray, normals: jnp.ndarray,
                                     weights: jnp.ndarray) -> AllPrimParams:
    """All-type fits for K segments sharing one point cloud.

    points/normals: [N, 3]; weights: [K, N] (per-segment membership).
    This is the shape-level layout used by the e2e fitting loss: the point
    cloud is not re-gathered per segment, only the weight rows differ.
    """
    return jax.vmap(lambda w: fit_all_primitives(points, normals, w))(weights)
