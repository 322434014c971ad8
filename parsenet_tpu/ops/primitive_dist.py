"""Closed-form point-to-primitive distances.

TPU-native equivalent of reference src/primitives.py:47-206
(ComputePrimitiveDistance). Each routine maps points [N, 3] + parameters to
per-point squared distances [N]; reductions are masked so fixed-shape padded
segments contribute nothing. The per-type dict dispatch of the reference
(`ResidualLoss.routines`) becomes `residual_select`: all four distances are
computed batched (cheap, elementwise) and the right one is selected per
segment by its primitive type — no data-dependent control flow under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.guards import guard_sqrt
from .primitive_fits import AllPrimParams

# primitive taxonomy (reference: readme_data.md:36-47, segment_utils.py:154-163)
LABEL_CLOSED_BSPLINE = (0, 6, 7, 9)
LABEL_PLANE = 1
LABEL_OPEN_BSPLINE = (2, 8)
LABEL_CONE = 3
LABEL_CYLINDER = 4
LABEL_SPHERE = 5
NUM_PRIMITIVE_CLASSES = 10


def sqdist_plane(points, normal, offset):
    """(reference: src/primitives.py:89-111) points [N,3], normal [3], offset []."""
    return (jnp.dot(points, normal) - offset) ** 2


def sqdist_sphere(points, center, radius):
    """(reference: src/primitives.py:113-127)."""
    d = jnp.linalg.norm(points - center, axis=-1) - radius
    return d * d


def sqdist_cylinder(points, axis, center, radius):
    """(reference: src/primitives.py:129-161)."""
    v = points - center
    along = jnp.dot(v, axis)
    perp2 = jnp.sum(v * v, axis=-1) - along * along
    perp2 = jnp.clip(perp2, min=1e-5)
    d = jnp.sqrt(perp2) - radius
    return d * d


def sqdist_cone(points, apex, axis, theta):
    """(reference: src/primitives.py:168-195)."""
    v = points - apex + 1e-8
    mod_v = jnp.linalg.norm(v, axis=-1)
    alpha_x = jnp.clip(jnp.dot(v, axis) / (mod_v + 1e-7), -0.999, 0.999)
    alpha = jnp.arccos(alpha_x)
    dist_angle = jnp.clip(jnp.abs(alpha - theta), max=jnp.pi / 2.0)
    d = mod_v * jnp.sin(dist_angle)
    return d * d


def sqdist_torus(points, axis, center, major_radius, minor_radius):
    """(reference: src/primitives.py:58-87)."""
    axis = axis / jnp.linalg.norm(axis)
    v = points - center
    z = jnp.dot(v, axis)
    x = guard_sqrt(jnp.sum(v * v, axis=-1) - z * z)
    right = (guard_sqrt((x - major_radius) ** 2 + z * z) - minor_radius) ** 2
    left = (guard_sqrt((x + major_radius) ** 2 + z * z) - minor_radius) ** 2
    return jnp.minimum(right, left)


# geometric-type codes used inside the fitting pipeline
GEOM_PLANE, GEOM_SPHERE, GEOM_CYLINDER, GEOM_CONE = 0, 1, 2, 3


def geom_type_from_label(label: jnp.ndarray) -> jnp.ndarray:
    """Map the dataset's 10-class primitive label to the 4 geometric fit
    types; spline labels map to -1 (handled by the spline path)."""
    t = jnp.full_like(label, -1)
    t = jnp.where(label == LABEL_PLANE, GEOM_PLANE, t)
    t = jnp.where(label == LABEL_SPHERE, GEOM_SPHERE, t)
    t = jnp.where(label == LABEL_CYLINDER, GEOM_CYLINDER, t)
    t = jnp.where(label == LABEL_CONE, GEOM_CONE, t)
    return t


def residual_select(points: jnp.ndarray, params: AllPrimParams,
                    geom_type: jnp.ndarray) -> jnp.ndarray:
    """Per-point squared distance to each segment's own primitive.

    points [N, 3]; params hold per-segment fits stacked over K (leading axis);
    geom_type [K] in {0..3} (anything else -> plane slot, caller masks it).
    Returns [K, N].
    """
    d_plane = jax.vmap(lambda a, d: sqdist_plane(points, a, d))(
        params.plane.normal, params.plane.offset)
    d_sphere = jax.vmap(lambda c, r: sqdist_sphere(points, c, r))(
        params.sphere.center, params.sphere.radius)
    d_cyl = jax.vmap(lambda a, c, r: sqdist_cylinder(points, a, c, r))(
        params.cylinder.axis, params.cylinder.center, params.cylinder.radius)
    d_cone = jax.vmap(lambda c, a, t: sqdist_cone(points, c, a, t))(
        params.cone.apex, params.cone.axis, params.cone.theta)
    t = geom_type[:, None]
    out = d_plane
    out = jnp.where(t == GEOM_SPHERE, d_sphere, out)
    out = jnp.where(t == GEOM_CYLINDER, d_cyl, out)
    out = jnp.where(t == GEOM_CONE, d_cone, out)
    return out
