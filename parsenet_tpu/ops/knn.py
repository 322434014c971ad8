"""k-nearest-neighbour graph construction.

TPU-native replacement for the reference's kNN (src/PointNet.py:9-69,
src/model.py:9-22): the reference materializes a full B x N x N distance
matrix per shape in a Python loop and calls topk. Here the pairwise-distance
computation is chunked over query rows so peak memory is O(chunk * N) instead
of O(N^2), the matmul maps onto the MXU, and everything stays inside one jit.

Two metrics are provided:
  * `knn`: plain squared-euclidean on the feature channels.
  * `knn_points_normals`: the joint metric d = d_p * (1 + d_n) that de-weights
    normals (reference: src/PointNet.py:29-69) — used for the first EdgeConv
    of the points+normals segmentation model.

The "dilated" neighbour selection of the reference (take top-k2 then stride
k2//k1: src/PointNet.py:11) is supported via (k1, k2).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


_CHUNK_TARGET = int(os.environ.get("PARSENET_KNN_CHUNK", "2500"))


def _row_chunks(n: int, target: int = 0) -> int:
    """Pick a query-chunk size that divides n and is close to `target`.

    Standalone slope timing says the UNchunked [n, n] program is ~1.6x
    faster than 1k-row lax.map chunks at n = 10k — but inside the fused
    inference pipeline the three [B, n, n] f32 score tensors (1.6 GB each
    at B = 4) wreck the XLA schedule (measured 38x slower end-to-end), so
    chunking stays the default. PARSENET_KNN_CHUNK overrides the target
    for experiments; peak memory is O(chunk * n) per vmap lane.
    """
    c = min(n, target or _CHUNK_TARGET)
    while n % c:
        c -= 1
    return c


def pairwise_sqdist(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distance between row sets: [M, C] x [N, C] -> [M, N]."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    inner = jnp.dot(q, x.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    return qq - 2.0 * inner + xx.T


APPROX_RECALL = float(os.environ.get("PARSENET_KNN_RECALL", "0.95"))
# approx_max_k recall vs throughput on v5e ([10k,10k], k=80): 0.99 ~59 ms,
# 0.95 ~10 ms, 0.85 is another ~36 ms/shape faster across the 3 EdgeConv
# stages + spline decoder of the full pipeline. The LIBRARY default is 0.95
# (quality-safe: measured 1.0000 neighbour overlap on trained shapes);
# throughput entry points (bench.py) opt into 0.85 via PARSENET_KNN_RECALL,
# where the trained-checkpoint A/B showed seg IoU 0.862 vs 0.857 and
# per-shape residuals within +/-10% both directions under the bench quality
# floors. Parity harnesses force exact kNN via PARSENET_KNN_EXACT=1
# (scripts/validate_reference.py) regardless of the recall env.
EXACT_DEFAULT = os.environ.get("PARSENET_KNN_EXACT", "0") == "1"
# NOTE: both env knobs are read at import/first-trace time; set them before
# the first knn() call (jit caches bake the values in).


def _topk_neighbors(neg_dist_chunk: jnp.ndarray, k2: int, stride: int,
                    exact: bool, recall: float = 0.0) -> jnp.ndarray:
    if exact or jax.default_backend() != "tpu":
        idx = lax.top_k(neg_dist_chunk, k2)[1]
    else:
        # TPU-native partial-reduce top-k: ~10-50x faster than the
        # sort-based exact lowering at n=10k; neighbour recall is
        # inconsequential for EdgeConv max-aggregation. recall=0.0 -> the
        # APPROX_RECALL env default (0.95); callers opt into a cheaper
        # target explicitly (models pass knn_recall, bench via env).
        idx = lax.approx_max_k(neg_dist_chunk, k2,
                               recall_target=recall or APPROX_RECALL)[1]
    if stride > 1:
        idx = idx[..., ::stride]
    return idx


def _knn_single(x: jnp.ndarray, k1: int, k2: int, chunk: int,
                exact: bool = False, recall: float = 0.0) -> jnp.ndarray:
    """kNN for one shape. x: [N, C] -> idx [N, k1]."""
    n = x.shape[0]
    stride = max(k2 // k1, 1)
    xx = jnp.sum(x * x, axis=-1)

    def body(q):  # q: [chunk, C]
        neg = 2.0 * jnp.dot(q, x.T, preferred_element_type=jnp.float32)
        neg = neg - jnp.sum(q * q, axis=-1, keepdims=True) - xx[None, :]
        return _topk_neighbors(neg, k2, stride, exact, recall)

    qs = x.reshape(n // chunk, chunk, x.shape[1])
    idx = lax.map(body, qs)
    return idx.reshape(n, -1)[:, :k1]


def _knn_pn_single(x: jnp.ndarray, k1: int, k2: int, chunk: int,
                   exact: bool = False, recall: float = 0.0) -> jnp.ndarray:
    """Joint point/normal metric kNN for one shape. x: [N, 6] -> idx [N, k1].

    d = d_points * (1 + d_normals) with d_normals = 2 - 2 <n_i, n_j>
    (reference: src/PointNet.py:44-52).
    """
    n = x.shape[0]
    stride = max(k2 // k1, 1)
    p, nrm = x[:, :3], x[:, 3:6]
    pp = jnp.sum(p * p, axis=-1)

    def body(args):
        qp, qn = args
        d_p = (jnp.sum(qp * qp, -1, keepdims=True)
               - 2.0 * jnp.dot(qp, p.T, preferred_element_type=jnp.float32)
               + pp[None, :])
        d_n = 2.0 - 2.0 * jnp.dot(qn, nrm.T, preferred_element_type=jnp.float32)
        return _topk_neighbors(-(d_p * (1.0 + d_n)), k2, stride, exact, recall)

    qs = (p.reshape(n // chunk, chunk, 3), nrm.reshape(n // chunk, chunk, 3))
    idx = lax.map(body, qs)
    return idx.reshape(n, -1)[:, :k1]


@functools.partial(jax.jit,
                   static_argnames=("k1", "k2", "chunk", "exact", "recall"))
def knn(x: jnp.ndarray, k1: int, k2: Optional[int] = None, chunk: int = 0,
        exact: bool = False, recall: float = 0.0) -> jnp.ndarray:
    """Batched kNN indices. x: [B, N, C] -> [B, N, k1] (no gradients flow).

    k2 > k1 gives the reference's dilated selection (stride = k2 // k1).
    exact=True forces the exact sort-based top-k (CPU always exact).
    recall=0.0 -> the APPROX_RECALL env default; a nonzero value overrides
    it per call (the fast train-step bundle passes 0.85 via the model's
    knn_recall attribute).
    """
    k2 = k2 or k1
    c = chunk or _row_chunks(x.shape[1])
    exact = exact or EXACT_DEFAULT
    idx = jax.vmap(lambda xb: _knn_single(xb, k1, k2, c, exact, recall))(x)
    return lax.stop_gradient(idx)


@functools.partial(jax.jit,
                   static_argnames=("k1", "k2", "chunk", "exact", "recall"))
def knn_points_normals(x: jnp.ndarray, k1: int, k2: Optional[int] = None,
                       chunk: int = 0, exact: bool = False,
                       recall: float = 0.0) -> jnp.ndarray:
    """Batched joint point/normal kNN. x: [B, N, 6] -> [B, N, k1]."""
    k2 = k2 or k1
    c = chunk or _row_chunks(x.shape[1])
    exact = exact or EXACT_DEFAULT
    idx = jax.vmap(lambda xb: _knn_pn_single(xb, k1, k2, c, exact, recall))(x)
    return lax.stop_gradient(idx)


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbour features. x: [B, N, C], idx: [B, N, k] -> [B, N, k, C]."""
    return jax.vmap(lambda xb, ib: xb[ib])(x, idx)


def edge_features(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """EdgeConv features concat(x_j - x_i, x_i): [B, N, k, 2C]
    (reference: src/PointNet.py:72-103)."""
    nbrs = gather_neighbors(x, idx)
    center = jnp.broadcast_to(x[:, :, None, :], nbrs.shape)
    return jnp.concatenate([nbrs - center, center], axis=-1)
