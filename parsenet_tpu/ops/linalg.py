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

_GAP_EPS = 1e-4


@jax.custom_vjp
def safe_eigh(A: jnp.ndarray):
    """eigh(A) for symmetric A [..., n, n] with eigengap-clamped gradients."""
    return jnp.linalg.eigh(A)


def _safe_eigh_fwd(A):
    w, U = jnp.linalg.eigh(A)
    return (w, U), (w, U)


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


def ridge_lstsq(A: jnp.ndarray, y: jnp.ndarray, lam: float = 0.01) -> jnp.ndarray:
    """Solve min ||A x - y||^2 + lam ||x||^2 via normal equations.

    A: [..., m, n], y: [..., m, k] -> x: [..., n, k]. TPU-friendly stand-in
    for the reference's QR-or-auto-ridge lstsq (src/fitting_utils.py:32-85).
    """
    At = jnp.swapaxes(A, -1, -2)
    AtA = jnp.matmul(At, A)
    n = AtA.shape[-1]
    AtA = AtA + lam * jnp.eye(n, dtype=AtA.dtype)
    Aty = jnp.matmul(At, y)
    return jnp.linalg.solve(AtA, Aty)
