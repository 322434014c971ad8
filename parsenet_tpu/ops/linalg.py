"""Differentiable linear algebra for the fitting stack.

The reference guards its fitting linalg with a CustomSVD autograd Function
that clamps the eigengap K-matrix (src/fitting_utils.py:385-455, eq. 13 of
Ionescu et al.) and a QR-or-auto-ridge least squares (src/fitting_utils.py:
32-85). TPU-native versions:

* `safe_eigh` — symmetric eigendecomposition with a custom VJP whose
  1/(lambda_j - lambda_i) factors are clamped, so degenerate spectra (flat
  segments, collinear normals) give bounded gradients instead of NaN.
  All fits need only 3x3 problems, which batch trivially under vmap.
* `ridge_lstsq` — normal-equations solve with a ridge term; the auto-lambda
  search of the reference collapses to a fixed small lambda because the
  normal matrix is 3x3 and the ridge keeps it PD.
* `smallest_eigvec` — the workhorse: weighted covariance -> eigenvector of
  the smallest eigenvalue (plane normal / cylinder axis direction).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from ..core.guards import highest_precision

_GAP_EPS = 1e-4


@highest_precision
def _jacobi_eigh3(A: jnp.ndarray, sweeps: int = 7):
    """Branch-free cyclic-Jacobi eigendecomposition for symmetric 3x3
    matrices [..., 3, 3] -> (eigvals ascending [..., 3], eigvecs [..., 3, 3]).

    All fits in this framework reduce to 3x3 symmetric problems; a fixed
    unrolled Jacobi sweep compiles to a handful of tiny fused ops — far
    cheaper to compile and run (on both CPU and TPU) than the general
    jnp.linalg.eigh lowering, and exactly vectorizes under vmap.
    """
    dtype = A.dtype
    V = jnp.broadcast_to(jnp.eye(3, dtype=dtype), A.shape)

    def rotate(A, V, p, q):
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        J = jnp.broadcast_to(jnp.eye(3, dtype=dtype), A.shape)
        J = J.at[..., p, p].set(c).at[..., q, q].set(c)
        J = J.at[..., p, q].set(s).at[..., q, p].set(-s)
        A = jnp.swapaxes(J, -1, -2) @ A @ J
        return A, V @ J

    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            A, V = rotate(A, V, p, q)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def _eigh_impl(A: jnp.ndarray):
    if A.shape[-1] == 3:
        return _jacobi_eigh3(A)
    return jnp.linalg.eigh(A)


@jax.custom_vjp
def safe_eigh(A: jnp.ndarray):
    """eigh(A) for symmetric A [..., n, n] with eigengap-clamped gradients."""
    return _eigh_impl(A)


def _safe_eigh_fwd(A):
    w, U = _eigh_impl(A)
    return (w, U), (w, U)


@highest_precision
def _safe_eigh_bwd(res, g):
    w, U = res
    gw, gU = g
    n = w.shape[-1]
    d = w[..., None, :] - w[..., :, None]  # d[i, j] = w_j - w_i
    sign = jnp.where(d >= 0, 1.0, -1.0)
    F = sign / jnp.maximum(jnp.abs(d), _GAP_EPS)
    eye = jnp.eye(n, dtype=A_dtype(w))
    F = F * (1.0 - eye)
    Ut = jnp.swapaxes(U, -1, -2)
    mid = F * jnp.matmul(Ut, gU)
    mid = mid + eye * gw[..., None, :]
    dA = jnp.matmul(U, jnp.matmul(mid, Ut))
    dA = 0.5 * (dA + jnp.swapaxes(dA, -1, -2))
    return (dA,)


def A_dtype(w):
    return w.dtype


safe_eigh.defvjp(_safe_eigh_fwd, _safe_eigh_bwd)


@highest_precision
def smallest_eigvec(M: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric M [..., n, n].

    Replaces the reference's `customsvd(weighted_X)[2][:, -1]`
    (src/primitive_forward.py:725-726): the smallest right singular vector of
    X equals the smallest eigenvector of X^T X.
    The sign is fixed (largest-|component| positive) for determinism.
    """
    w, U = safe_eigh(M)
    v = U[..., :, 0]  # eigh sorts ascending
    pick = jnp.argmax(jnp.abs(v), axis=-1, keepdims=True)
    s = jnp.sign(jnp.take_along_axis(v, pick, axis=-1))
    return v * jnp.where(s == 0, 1.0, s)


@highest_precision
def ridge_lstsq(A: jnp.ndarray, y: jnp.ndarray, lam: float = 0.01) -> jnp.ndarray:
    """Solve min ||A x - y||^2 + lam ||x||^2 via normal equations.

    A: [..., m, n], y: [..., m, k] -> x: [..., n, k]. TPU-friendly stand-in
    for the reference's QR-or-auto-ridge lstsq (src/fitting_utils.py:32-85).
    The ridge is scale-invariant (relative to trace(A^T A)/n) so rank-deficient
    systems — e.g. the planar circle inside the cylinder fit — resolve to the
    minimal-norm solution regardless of point count or scale.
    """
    At = jnp.swapaxes(A, -1, -2)
    AtA = jnp.matmul(At, A)
    n = AtA.shape[-1]
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None] / n
    AtA = AtA + (lam * tr + 1e-10) * jnp.eye(n, dtype=AtA.dtype)
    Aty = jnp.matmul(At, y)
    return jnp.linalg.solve(AtA, Aty)
