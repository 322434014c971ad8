"""Point-axis sharding for the O(N^2) kernels (ring collectives).

SURVEY §5: the reference shrinks point counts to fit one GPU (random
subsample, chunking, empty_cache). The TPU-native answer for clouds beyond
one chip's HBM is to shard the POINT axis over the ICI mesh and run the
pairwise kernels as ring passes — sequence/context parallelism applied to
kNN/chamfer instead of attention.

Each device holds a shard of queries and a shard of targets; target shards
rotate around the ring with `lax.ppermute` while every device folds the
visiting shard into its local running result:

* `ring_min_sqdist` — chamfer core: running min distance (+ argmin).
* `ring_knn` — running top-k neighbour merge (global indices).

Both are `shard_map`-based, compile to ICI collective-permutes, and are
validated on the virtual 8-device CPU mesh.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import DATA_AXIS


def _ring_passes(axis_name: str, local_fold, init, x_shard):
    """Generic ring: fold the local target shard, then rotate it around the
    ring, folding each visiting shard. `local_fold(carry, shard, src_idx)`."""
    n_dev = lax.psum(1, axis_name)
    me = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(step, carry_and_shard):
        carry, shard = carry_and_shard
        src = (me - step) % n_dev  # who originally owned this shard
        carry = local_fold(carry, shard, src)
        shard = lax.ppermute(shard, axis_name, perm)
        return carry, shard

    carry, _ = lax.fori_loop(0, n_dev, body, (init, x_shard))
    return carry


def ring_min_sqdist(mesh: Mesh, q: jnp.ndarray, x: jnp.ndarray,
                    axis: str = DATA_AXIS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min squared distance + global argmin with BOTH point sets sharded.

    q: [N, 3], x: [M, 3] (logically global; sharded on axis 0 over `axis`).
    Returns (d [N], idx [N]) replicating nothing bigger than the shards.
    """
    m_local = x.shape[0] // mesh.shape[axis]

    def kernel(q_s, x_s):
        def fold(carry, shard, src):
            d_best, i_best = carry
            d = (jnp.sum(q_s * q_s, 1)[:, None]
                 - 2.0 * jnp.dot(q_s, shard.T,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                 + jnp.sum(shard * shard, 1)[None, :])
            loc = jnp.min(d, axis=1)
            arg = jnp.argmin(d, axis=1) + src * m_local
            better = loc < d_best
            return (jnp.where(better, loc, d_best),
                    jnp.where(better, arg, i_best))

        # derive the init carry from varying data so shard_map's
        # varying-axis types match across the loop
        zero = q_s[:, 0] * 0.0
        init = (zero + 1e30, zero.astype(jnp.int32))
        return _ring_passes(axis, fold, init, x_s)

    f = shard_map(kernel, mesh=mesh, in_specs=(P(axis), P(axis)),
                  out_specs=(P(axis), P(axis)))
    return f(q, x)


def ring_knn(mesh: Mesh, x: jnp.ndarray, k: int,
             axis: str = DATA_AXIS) -> jnp.ndarray:
    """k-nearest-neighbour indices with the cloud sharded on the point axis.

    x: [N, C] (sharded over `axis`). Returns global neighbour indices [N, k].
    Running top-k is merged across ring steps by concatenating the incumbent
    with each visiting shard's candidates and re-selecting.
    """
    m_local = x.shape[0] // mesh.shape[axis]

    def kernel(x_s):
        def fold(carry, shard, src):
            best_v, best_i = carry
            neg = (2.0 * jnp.dot(x_s, shard.T,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                   - jnp.sum(x_s * x_s, 1)[:, None]
                   - jnp.sum(shard * shard, 1)[None, :])
            v, i = lax.top_k(neg, min(k, shard.shape[0]))
            i = i + src * m_local
            cat_v = jnp.concatenate([best_v, v], axis=1)
            cat_i = jnp.concatenate([best_i, i], axis=1)
            nv, sel = lax.top_k(cat_v, k)
            ni = jnp.take_along_axis(cat_i, sel, axis=1)
            return nv, ni

        zero = jnp.zeros((x_s.shape[0], k), jnp.float32) + x_s[:, :1] * 0.0
        init = (zero - 1e30, zero.astype(jnp.int32))
        _, idx = _ring_passes(axis, fold, init, x_s)
        return idx

    f = shard_map(kernel, mesh=mesh, in_specs=(P(axis),),
                  out_specs=P(axis))
    return f(x)
