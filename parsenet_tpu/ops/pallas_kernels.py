"""Pallas TPU kernels for the O(N^2) hot ops.

The mean-shift iteration is exactly unnormalized attention on the unit
sphere:  new_m = normalize( (K @ X) / rowsum(K) ),  K = exp((m.x - 1)/b^2).
The exponent is <= 0, so the flash pattern needs no running max: each kernel
instance streams column tiles of X through VMEM, accumulating K @ X and
rowsum(K) without ever materializing the [N, N] kernel matrix in HBM
(the jnp fallback writes ~400 MB per iteration at N = 10k).

Used on the no-grad inference path (eval clustering); the differentiable
training path keeps the XLA implementation (same math).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 256
COL_TILE = 512


def _ms_step_kernel(scalar_ref, m_ref, x_ref, out_ref):
    """One mean-shift update for a ROW_TILE block of shifted points.

    scalar_ref (SMEM [2]): [inv2b2, n_valid]; m_ref [ROW_TILE, D];
    x_ref [N_pad, D] (full cloud in VMEM); out_ref [ROW_TILE, D].
    """
    inv2b2 = scalar_ref[0]
    n_valid = scalar_ref[1].astype(jnp.int32)
    m = m_ref[:]
    tm, d = m.shape
    n_pad = x_ref.shape[0]

    def body(j, carry):
        acc, rs = carry
        xj = x_ref[pl.ds(j * COL_TILE, COL_TILE), :]
        s = jnp.dot(m, xj.T, preferred_element_type=jnp.float32)
        k = jnp.exp((2.0 * s - 2.0) * inv2b2)
        col = j * COL_TILE + lax.broadcasted_iota(jnp.int32, (1, COL_TILE), 1)
        k = jnp.where(col < n_valid, k, 0.0)
        acc = acc + jnp.dot(k, xj, preferred_element_type=jnp.float32)
        rs = rs + jnp.sum(k, axis=1, keepdims=True)
        return acc, rs

    acc0 = jnp.zeros((tm, d), jnp.float32)
    rs0 = jnp.zeros((tm, 1), jnp.float32)
    acc, rs = lax.fori_loop(0, n_pad // COL_TILE, body, (acc0, rs0))
    new_m = acc / (rs + 1e-12)
    norm = jnp.sqrt(jnp.sum(new_m * new_m, axis=1, keepdims=True))
    out_ref[:] = new_m / (norm + 1e-12)


def _pad_to(x, mult, axis):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mean_shift_step_pallas(m: jnp.ndarray, x: jnp.ndarray,
                           inv2b2: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """One fused mean-shift update. m, x: [N, D] -> [N, D]."""
    n, d = m.shape
    d_pad = max(d, 128)
    m_p = _pad_to(_pad_to(m, ROW_TILE, 0), d_pad, 1)
    x_p = _pad_to(_pad_to(x, COL_TILE, 0), d_pad, 1)
    scalars = jnp.stack([jnp.asarray(inv2b2, jnp.float32),
                         jnp.asarray(n, jnp.float32)])
    n_rows = m_p.shape[0]
    out = pl.pallas_call(
        _ms_step_kernel,
        grid=(n_rows // ROW_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, m_p.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((x_p.shape[0], x_p.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, m_p.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(m_p.shape, jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_rows * x_p.shape[0] * d_pad,
            bytes_accessed=(n_rows + x_p.shape[0]) * d_pad * 4,
            transcendentals=n_rows * x_p.shape[0],
        ),
    )(scalars, m_p, x_p)
    return out[:n, :d]


def mean_shift_iterations_pallas(X: jnp.ndarray, bandwidth: jnp.ndarray,
                                 iterations: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.mean_shift.mean_shift_iterations (gaussian kernel,
    forward only — wrap in stop_gradient on differentiable paths)."""
    inv2b2 = 1.0 / (2.0 * bandwidth * bandwidth)

    def body(_, m):
        return mean_shift_step_pallas(m, X, inv2b2, interpret=interpret)

    return lax.fori_loop(0, iterations, body, X)


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"
