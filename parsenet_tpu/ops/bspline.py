"""B-spline / Bezier machinery.

The insight from the reference (SURVEY §7.6): once the basis matrices are
precomputed, all spline evaluation and fitting is matmuls — ideal MXU work.

* `basis_function_one` / `uniform_knot_bspline`: NURBS-Book Alg 2.4 basis
  evaluation done in numpy at trace time (reference: src/loss.py:190-297,
  src/approximation.py:416-514). The resulting (grid, n_ctrl) matrices become
  jit constants.
* `sample_surface`: batched surface evaluation nu @ CP @ nv^T via einsum
  (reference: src/loss.py:142-170 does it with Python loops over batch/xyz).
* Bernstein/Bezier basis + `fit_bezier_kronecker`: scattered-point
  least-squares control-point refit, A_i = nu_i (x) nv_i
  (reference: src/approximation.py:288-364), expressed as a single batched
  ridge solve.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import comb
from ..core.guards import highest_precision


def basis_function_one(degree: int, knot_vector, span: int, knot: float) -> float:
    """Single B-spline basis value N_{span,degree}(knot), NURBS Book Alg 2.4.

    Pure-python/numpy; used only for precomputing constant basis matrices
    (reference: src/loss.py:242-297).
    """
    kv = list(knot_vector)
    if ((span == 0 and knot == kv[0])
            or (span == len(kv) - degree - 2) and knot == kv[-1]):
        return 1.0
    if knot < kv[span] or knot >= kv[span + degree + 1]:
        return 0.0
    N = [0.0] * (degree + span + 1)
    for j in range(degree + 1):
        if kv[span + j] <= knot < kv[span + j + 1]:
            N[j] = 1.0
    for k in range(1, degree + 1):
        saved = 0.0
        if N[0] != 0.0:
            saved = ((knot - kv[span]) * N[0]) / (kv[span + k] - kv[span])
        for j in range(degree - k + 1):
            u_left = kv[span + j + 1]
            u_right = kv[span + j + k + 1]
            if N[j + 1] == 0.0:
                N[j] = saved
                saved = 0.0
            else:
                temp = N[j + 1] / (u_right - u_left)
                N[j] = saved + (u_right - knot) * temp
                saved = (knot - u_left) * temp
    return N[0]


def uniform_knots(n_ctrl: int, degree: int) -> np.ndarray:
    """Open-uniform knot vector (reference: src/loss.py:197-198)."""
    interior = np.arange(0, 1.01, 1.0 / (n_ctrl - degree)).tolist()
    return np.array([0.0] * degree + interior + [1.0] * degree)


def uniform_knot_bspline(n_ctrl_u: int, n_ctrl_v: int, degree_u: int,
                         degree_v: int, grid_size: int = 30
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Basis matrices nu [grid, n_ctrl_u], nv [grid, n_ctrl_v] on a uniform
    parameter grid u = v = arange(0, 1, 1/grid) (reference: src/loss.py:190-210)."""
    u = np.arange(0.0, 1.0, 1.0 / grid_size)
    ku = uniform_knots(n_ctrl_u, degree_u)
    kv = uniform_knots(n_ctrl_v, degree_v)
    nu = np.zeros((u.shape[0], n_ctrl_u))
    nv = np.zeros((u.shape[0], n_ctrl_v))
    for i, ui in enumerate(u):
        for j in range(n_ctrl_u):
            nu[i, j] = basis_function_one(degree_u, ku, j, ui)
        for j in range(n_ctrl_v):
            nv[i, j] = basis_function_one(degree_v, kv, j, ui)
    return nu.astype(np.float32), nv.astype(np.float32)


def basis_matrix_at(params: np.ndarray, n_ctrl: int, degree: int) -> np.ndarray:
    """Basis matrix at arbitrary parameter values [M] -> [M, n_ctrl]."""
    kv = uniform_knots(n_ctrl, degree)
    out = np.zeros((len(params), n_ctrl))
    for i, t in enumerate(params):
        for j in range(n_ctrl):
            out[i, j] = basis_function_one(degree, kv, j, float(t))
    return out.astype(np.float32)


# --------------------------------------------------------------------------
# JAX surface evaluation / fitting — everything below is jit/grad friendly.
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
@highest_precision
def sample_surface(nu: jnp.ndarray, nv: jnp.ndarray, cp: jnp.ndarray) -> jnp.ndarray:
    """Evaluate surfaces on the parameter grid.

    nu: [Gu, U], nv: [Gv, V], cp: [..., U, V, 3] -> [..., Gu*Gv, 3].
    One einsum instead of the reference's per-batch/per-coordinate matmul
    loop (src/loss.py:161-168).
    """
    pts = jnp.einsum("gu,...uvc,hv->...ghc", nu, cp, nv,
                     preferred_element_type=jnp.float32)
    return pts.reshape(*cp.shape[:-3], nu.shape[0] * nv.shape[0], 3)


def close_control_grid(cp: jnp.ndarray) -> jnp.ndarray:
    """Append the wrap-around row for closed (u-periodic) splines
    (reference: src/primitive_forward.py:380 `cat([temp, temp[0:1]])`)."""
    return jnp.concatenate([cp, cp[..., 0:1, :, :]], axis=-3)


def bernstein_basis(n_ctrl: int, params: np.ndarray) -> np.ndarray:
    """Bernstein polynomial basis matrix [M, n_ctrl] of degree n_ctrl-1
    (reference: src/approximation.py:288-309)."""
    deg = n_ctrl - 1
    t = np.asarray(params)[:, None]
    i = np.arange(n_ctrl)[None, :]
    return (comb(deg, i) * (t ** i) * ((1 - t) ** (deg - i))).astype(np.float32)


@jax.jit
@highest_precision
def fit_surface_kronecker(nu_p: jnp.ndarray, nv_p: jnp.ndarray,
                          points: jnp.ndarray, weights: jnp.ndarray,
                          lam: float = 1e-5) -> jnp.ndarray:
    """Weighted scattered-point LS fit of a control grid.

    nu_p: [M, U] basis at each point's u-parameter, nv_p: [M, V] at v,
    points: [M, 3], weights: [M]. Solves  min || w .* (A c - p) ||^2 with
    A_i = nu_i (x) nv_i  (reference: src/approximation.py:338-364) via the
    normal equations with a ridge term (the reference's auto-lambda lstsq,
    src/fitting_utils.py:32-85).
    Returns control grid [U, V, 3].
    """
    U, V = nu_p.shape[1], nv_p.shape[1]
    A = (nu_p[:, :, None] * nv_p[:, None, :]).reshape(-1, U * V)
    Aw = A * weights[:, None]
    AtA = jnp.dot(Aw.T, Aw, preferred_element_type=jnp.float32)
    AtY = jnp.dot(Aw.T, points * weights[:, None],
                  preferred_element_type=jnp.float32)
    c = jnp.linalg.solve(AtA + lam * jnp.eye(U * V, dtype=AtA.dtype), AtY)
    return c.reshape(U, V, 3)


def regular_parameterization(grid_u: int, grid_v: int) -> np.ndarray:
    """Uniform UV grid in [0,1]^2, [grid_u*grid_v, 2]
    (reference: src/curve_utils.py:201-209)."""
    u = np.linspace(0, 1, grid_u)
    v = np.linspace(0, 1, grid_v)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    return np.stack([uu.reshape(-1), vv.reshape(-1)], 1).astype(np.float32)
