"""Sampling points on fitted primitive surfaces.

Equivalent of reference src/primitive_forward.py:427-693 (Fit.sample_*):
regular parameter grids on each fitted surface, trimmed to the extent of the
input segment. Used by the eval pipeline for residual/coverage metrics and
mesh export. All samplers are fixed-shape and vmap-friendly; extent trimming
uses the segment's projections instead of data-dependent shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.guards import EPS


def _orthonormal_frame(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two unit vectors spanning the plane perpendicular to unit vector a."""
    h = jnp.where(jnp.abs(a[0]) < 0.9,
                  jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    b1 = jnp.cross(a, h)
    b1 = b1 / (jnp.linalg.norm(b1) + EPS)
    b2 = jnp.cross(a, b1)
    return b1, b2


def _extent(vals: jnp.ndarray, mask: jnp.ndarray):
    big = 1e9
    lo = jnp.min(jnp.where(mask > 0, vals, big))
    hi = jnp.max(jnp.where(mask > 0, vals, -big))
    return lo, hi


def sample_plane(normal: jnp.ndarray, offset: jnp.ndarray,
                 seg_points: jnp.ndarray, seg_mask: jnp.ndarray,
                 grid: int = 32) -> jnp.ndarray:
    """Regular grid on the fitted plane covering the segment's bbox
    (reference: src/primitive_forward.py:452-471). Returns [grid*grid, 3]."""
    a = normal / (jnp.linalg.norm(normal) + EPS)
    b1, b2 = _orthonormal_frame(a)
    u = jnp.dot(seg_points, b1)
    v = jnp.dot(seg_points, b2)
    ulo, uhi = _extent(u, seg_mask)
    vlo, vhi = _extent(v, seg_mask)
    t = jnp.linspace(0.0, 1.0, grid)
    uu = ulo + (uhi - ulo) * t
    vv = vlo + (vhi - vlo) * t
    U, V = jnp.meshgrid(uu, vv, indexing="ij")
    pts = (offset * a[None, :] + U.reshape(-1, 1) * b1[None, :]
           + V.reshape(-1, 1) * b2[None, :])
    return pts


def sample_sphere(center: jnp.ndarray, radius: jnp.ndarray,
                  grid: int = 32, seg_points: jnp.ndarray = None,
                  seg_mask: jnp.ndarray = None) -> jnp.ndarray:
    """Sphere samples (reference: src/primitive_forward.py:601-617 uses a
    lat-long grid). Returns [grid*grid, 3].

    With seg_points/seg_mask the samples cover only the spherical CAP
    spanned by the segment (polar grid around the members' mean direction,
    up to their max angular radius). The reference gets the same effect by
    bit-mapping the full-sphere mesh against the segment's points
    (src/fitting_utils.py:646-691): without trimming, a small cap segment
    on a large sphere puts ~all of the area-weighted coverage samples on
    the far side of the sphere."""
    if seg_points is None:
        i = jnp.arange(grid * grid, dtype=jnp.float32)
        # Fibonacci sphere: better uniformity than lat-long, no pole
        # clustering
        ga = jnp.pi * (3.0 - jnp.sqrt(5.0))
        z = 1.0 - 2.0 * (i + 0.5) / (grid * grid)
        r = jnp.sqrt(jnp.clip(1.0 - z * z, min=0.0))
        th = ga * i
        d = jnp.stack([r * jnp.cos(th), r * jnp.sin(th), z], axis=1)
        return center[None, :] + radius * d
    dn = seg_points - center[None, :]
    dn = dn / (jnp.linalg.norm(dn, axis=1, keepdims=True) + EPS)
    m = jnp.sum(dn * (seg_mask[:, None] > 0), axis=0)
    m = m / (jnp.linalg.norm(m) + EPS)  # degenerate m -> alpha ~ pi anyway
    cmin = jnp.min(jnp.where(seg_mask > 0, jnp.dot(dn, m), 1.0))
    alpha = jnp.clip(jnp.arccos(jnp.clip(cmin, -1.0, 1.0)), 0.05, jnp.pi)
    b1, b2 = _orthonormal_frame(m)
    th = jnp.linspace(0.0, 1.0, grid) * alpha
    ph = jnp.linspace(0.0, 2.0 * jnp.pi, grid, endpoint=False)
    TH, PH = jnp.meshgrid(th, ph, indexing="ij")
    dirs = (jnp.cos(TH).reshape(-1, 1) * m[None, :]
            + (jnp.sin(TH) * jnp.cos(PH)).reshape(-1, 1) * b1[None, :]
            + (jnp.sin(TH) * jnp.sin(PH)).reshape(-1, 1) * b2[None, :])
    return center[None, :] + radius * dirs


def sample_cylinder(axis: jnp.ndarray, center: jnp.ndarray,
                    radius: jnp.ndarray, seg_points: jnp.ndarray,
                    seg_mask: jnp.ndarray, grid: int = 32) -> jnp.ndarray:
    """Cylinder samples over the segment's axial extent
    (reference: src/primitive_forward.py:619-661 sample_cylinder_trim)."""
    a = axis / (jnp.linalg.norm(axis) + EPS)
    b1, b2 = _orthonormal_frame(a)
    h = jnp.dot(seg_points - center, a)
    hlo, hhi = _extent(h, seg_mask)
    t = jnp.linspace(0.0, 1.0, grid)
    hs = hlo + (hhi - hlo) * t
    th = jnp.linspace(0.0, 2.0 * jnp.pi, grid, endpoint=False)
    H, TH = jnp.meshgrid(hs, th, indexing="ij")
    ring = (jnp.cos(TH).reshape(-1, 1) * b1[None, :]
            + jnp.sin(TH).reshape(-1, 1) * b2[None, :])
    return center[None, :] + radius * ring + H.reshape(-1, 1) * a[None, :]


def sample_cone(apex: jnp.ndarray, axis: jnp.ndarray, theta: jnp.ndarray,
                seg_points: jnp.ndarray, seg_mask: jnp.ndarray,
                grid: int = 32) -> jnp.ndarray:
    """Cone samples over the segment's extent along the axis
    (reference: src/primitive_forward.py:474-599 sample_cone_trim)."""
    a = axis / (jnp.linalg.norm(axis) + EPS)
    b1, b2 = _orthonormal_frame(a)
    s = jnp.dot(seg_points - apex, a)  # distance along axis
    slo, shi = _extent(s, seg_mask)
    t = jnp.linspace(0.0, 1.0, grid)
    ss = slo + (shi - slo) * t
    th = jnp.linspace(0.0, 2.0 * jnp.pi, grid, endpoint=False)
    S, TH = jnp.meshgrid(ss, th, indexing="ij")
    rad = jnp.abs(S) * jnp.tan(theta)
    ring = (jnp.cos(TH).reshape(-1, 1) * b1[None, :]
            + jnp.sin(TH).reshape(-1, 1) * b2[None, :])
    return (apex[None, :] + S.reshape(-1, 1) * a[None, :]
            + rad.reshape(-1, 1) * ring)


def sample_torus(axis: jnp.ndarray, center: jnp.ndarray,
                 major_radius: jnp.ndarray, minor_radius: jnp.ndarray,
                 grid: int = 32) -> jnp.ndarray:
    """(reference: src/primitive_forward.py:427-450)."""
    a = axis / (jnp.linalg.norm(axis) + EPS)
    b1, b2 = _orthonormal_frame(a)
    u = jnp.linspace(0.0, 2.0 * jnp.pi, grid, endpoint=False)
    v = jnp.linspace(0.0, 2.0 * jnp.pi, grid, endpoint=False)
    U, V = jnp.meshgrid(u, v, indexing="ij")
    ring = (jnp.cos(U).reshape(-1, 1) * b1[None, :]
            + jnp.sin(U).reshape(-1, 1) * b2[None, :])
    r = major_radius + minor_radius * jnp.cos(V).reshape(-1)
    z = minor_radius * jnp.sin(V).reshape(-1)
    return center[None, :] + r[:, None] * ring + z[:, None] * a[None, :]


def project_to_plane(points: jnp.ndarray, normal: jnp.ndarray,
                     offset: jnp.ndarray) -> jnp.ndarray:
    """Project points onto the plane <normal, p> = offset
    (reference: src/fitting_utils.py:625-634)."""
    a = normal / (jnp.linalg.norm(normal) + EPS)
    prj = points - jnp.dot(points, a)[:, None] * a[None, :]
    return prj + a[None, :] * offset


def project_to_point_cloud(points: jnp.ndarray, surface: jnp.ndarray) -> jnp.ndarray:
    """Snap each point to its nearest surface sample
    (reference: src/fitting_utils.py:637-643)."""
    d = (jnp.sum(points * points, 1)[:, None]
         - 2.0 * jnp.dot(points, surface.T, preferred_element_type=jnp.float32)
         + jnp.sum(surface * surface, 1)[None, :])
    return surface[jnp.argmin(d, axis=1)]
