"""Numerical guards.

TPU-native equivalents of the reference's defensive numerics
(reference: src/guard.py:7-14, src/fitting_utils.py:385-455). All guards are
jit-safe, elementwise, and differentiable where it matters (clamps detach the
gradient outside the safe region, matching torch.clamp semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = jnp.finfo(jnp.float32).eps


def highest_precision(fn):
    """Trace the wrapped function with full-f32 matmul precision.

    On TPU (and this environment's XLA CPU) the DEFAULT matmul precision is
    single-pass bf16 — great for the network convs, fatal for geometry:
    pairwise distances, 3x3 eigen/solve systems, one-hot count matrices and
    basis-matrix surface evaluation all need exact f32. Wrapping the
    correctness-critical leaf ops keeps the big model matmuls fast while the
    fitting/metric stack stays accurate.
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapper


def guard_exp(x, max_value: float = 75.0, min_value: float = -75.0):
    """exp with input clamped to avoid overflow (reference: src/guard.py:7-10)."""
    x = jnp.clip(x, min_value, max_value)
    return jnp.exp(x)


def guard_sqrt(x, minimum: float = 1e-5):
    """sqrt with input clamped away from 0 so the gradient stays finite
    (reference: src/guard.py:13-14)."""
    x = jnp.clip(x, min=minimum)
    return jnp.sqrt(x)


def safe_acos(x, eps: float = 1e-3):
    """acos with the argument pulled off +-1 where d/dx acos blows up
    (reference: src/primitive_forward.py:836-839)."""
    return jnp.arccos(jnp.clip(x, -1.0 + eps, 1.0 - eps))


def safe_normalize(x, axis: int = -1, eps: float = 1e-8):
    """L2-normalize along `axis`, guarding the zero vector."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / (n + eps)


def masked_mean(x, mask, axis=None, eps: float = 1e-8):
    """Mean of `x` over entries where `mask` is nonzero."""
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask, axis=axis) / (jnp.sum(mask, axis=axis) + eps)
