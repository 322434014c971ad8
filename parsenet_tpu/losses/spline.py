"""Spline training losses.

TPU-native equivalents of reference src/loss.py. The permutation minimum
(8 flips/transposes for open grids, 4 flips x G cyclic rolls for closed) is a
stacked tensor min instead of Python list appends; the per-batch matmul loop
of the reconstruction loss is one einsum; the 5-point Laplacian conv2d is a
fixed stencil.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.chamfer import chamfer_distance, chamfer_distance_one_side
from ..ops.bspline import sample_surface


def all_permutations(cp: jnp.ndarray) -> jnp.ndarray:
    """All 8 symmetries of an open control grid [B, G, G, 3] -> [B, 8, G, G, 3]
    (reference: src/loss.py:21-38)."""
    f1 = jnp.flip(cp, 1)
    f2 = jnp.flip(cp, 2)
    f12 = jnp.flip(cp, (1, 2))
    t = lambda a: jnp.swapaxes(a, 1, 2)
    return jnp.stack([cp, f1, f2, f12, t(cp), t(f1), t(f2), t(f12)], axis=1)


def all_permutations_half(cp: jnp.ndarray) -> jnp.ndarray:
    """The 4 flip symmetries for closed grids [B, G, G, 3] -> [B, 4, G, G, 3]
    (reference: src/loss.py:41-57)."""
    return jnp.stack([cp, jnp.flip(cp, 1), jnp.flip(cp, 2),
                      jnp.flip(cp, (1, 2))], axis=1)


@functools.partial(jax.jit, static_argnames=("grid",))
def control_points_permute_reg_loss(output: jnp.ndarray, cp: jnp.ndarray,
                                    grid: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min-over-8-permutations MSE (reference: src/loss.py:76-97).

    output: [B, G*G, 3] prediction; cp: [B, G, G, 3] ground truth.
    Returns (loss, best-permuted gt [B, G, G, 3]).
    """
    B = output.shape[0]
    out = output.reshape(B, 1, grid, grid, 3)
    perms = all_permutations(cp)  # [B, 8, G, G, 3]
    diff = jnp.sum((out - perms) ** 2, axis=(2, 3, 4))  # [B, 8]
    idx = jnp.argmin(diff, axis=1)
    loss = jnp.mean(jnp.min(diff, axis=1)) / (grid * grid * 3)
    best = jnp.take_along_axis(perms, idx[:, None, None, None, None],
                               axis=1)[:, 0]
    return loss, best


@functools.partial(jax.jit, static_argnames=("grid",))
def control_points_permute_closed_reg_loss(output: jnp.ndarray, cp: jnp.ndarray,
                                           grid: int
                                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min over 4 flips x `grid` cyclic rolls of the closed grid
    (reference: src/loss.py:100-124)."""
    B = output.shape[0]
    out = output.reshape(B, 1, grid, grid, 3)
    rolls = jnp.stack([jnp.roll(cp, i, axis=1) for i in range(grid)], axis=1)
    # [B, grid, G, G, 3] -> flips of each roll -> [B, grid*4, G, G, 3]
    perms = jax.vmap(all_permutations_half, in_axes=1, out_axes=1)(rolls)
    perms = perms.reshape(B, grid * 4, grid, grid, 3)
    diff = jnp.sum((out - perms) ** 2, axis=(2, 3, 4))
    idx = jnp.argmin(diff, axis=1)
    loss = jnp.mean(jnp.min(diff, axis=1)) / (grid * grid * 3)
    best = jnp.take_along_axis(perms, idx[:, None, None, None, None],
                               axis=1)[:, 0]
    return loss, best


def spline_reconstruction_loss(nu: jnp.ndarray, nv: jnp.ndarray,
                               output: jnp.ndarray, points: jnp.ndarray,
                               sqrt: bool = False):
    """Two-sided chamfer between sampled surface and input points
    (reference: src/loss.py:173-187). output: [B, G*G, 3], points: [B, N, 3]."""
    G = int(round(output.shape[1] ** 0.5))
    cp = output.reshape(output.shape[0], G, G, 3)
    recon = sample_surface(nu, nv, cp)
    return chamfer_distance(recon, points, sqrt=sqrt), recon


def spline_reconstruction_loss_one_sided(nu: jnp.ndarray, nv: jnp.ndarray,
                                         output: jnp.ndarray,
                                         points: jnp.ndarray, side: int = 1):
    """One-sided chamfer: prediction covers gt (reference: src/loss.py:142-170)."""
    G = int(round(output.shape[1] ** 0.5))
    cp = output.reshape(output.shape[0], G, G, 3)
    recon = sample_surface(nu, nv, cp)
    return chamfer_distance_one_side(recon, points, side=side), recon


_LAP_STENCIL = jnp.array([[0.0, 0.25, 0.0],
                          [0.25, -1.0, 0.25],
                          [0.0, 0.25, 0.0]], jnp.float32)


@jax.jit
def laplacian_loss(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """L2 between 5-point Laplacians of predicted and gt control grids
    (reference: src/loss.py:213-239). Both [B, G, G, 3]."""
    def lap(x):
        # depthwise 3x3 conv, zero padding, per xyz channel
        x_ = jnp.moveaxis(x, -1, 1)  # [B, 3, G, G]
        k = jnp.broadcast_to(_LAP_STENCIL, (3, 1, 3, 3))
        y = jax.lax.conv_general_dilated(
            x_, k, window_strides=(1, 1), padding="SAME",
            feature_group_count=3, precision=jax.lax.Precision.HIGHEST)
        return y

    d = (lap(output) - lap(gt)) ** 2
    return jnp.mean(jnp.sum(d, axis=1))
