"""Alternative clustering backends.

Equivalent of reference src/segment_utils.py:13-76 (`cluster`,
`cluster_prob`): besides the main differentiable mean-shift, the reference
can segment embeddings with sklearn KMeans / SpectralClustering / MeanShift.
Here KMeans is a jit-compiled on-device Lloyd iteration (kmeans++ style
farthest-point init) and spectral clustering is built from the same
primitives (affinity -> normalized Laplacian -> subspace iteration -> kmeans)
so everything runs on TPU; sklearn remains a host fallback.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.guards import highest_precision


@functools.partial(jax.jit, static_argnames=("k", "iters"))
@highest_precision
def kmeans(X: jnp.ndarray, k: int, key: jax.Array, iters: int = 25
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd's algorithm with farthest-point init. X: [N, D].

    Returns (labels [N] int32, centers [k, D]).
    """
    n = X.shape[0]

    # farthest-point (kmeans++-like) initialization
    def fp_body(i, carry):
        centers, mind = carry
        nxt = jnp.argmax(mind)
        c = X[nxt]
        centers = centers.at[i].set(c)
        d = jnp.sum((X - c) ** 2, axis=1)
        return centers, jnp.minimum(mind, d)

    first = X[jax.random.randint(key, (), 0, n)]
    centers0 = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(first)
    mind0 = jnp.sum((X - first) ** 2, axis=1)
    centers, _ = lax.fori_loop(1, k, fp_body, (centers0, mind0))

    def lloyd(_, centers):
        d = (jnp.sum(X * X, 1)[:, None]
             - 2.0 * jnp.dot(X, centers.T, preferred_element_type=jnp.float32)
             + jnp.sum(centers * centers, 1)[None, :])
        lab = jnp.argmin(d, axis=1)
        oh = jax.nn.one_hot(lab, k, dtype=X.dtype)  # [N, k]
        sums = jnp.dot(oh.T, X, preferred_element_type=jnp.float32)
        counts = jnp.sum(oh, axis=0)[:, None]
        new_c = sums / jnp.maximum(counts, 1.0)
        # keep empty clusters where they were
        return jnp.where(counts > 0, new_c, centers)

    centers = lax.fori_loop(0, iters, lloyd, centers)
    d = (jnp.sum(X * X, 1)[:, None]
         - 2.0 * jnp.dot(X, centers.T, preferred_element_type=jnp.float32)
         + jnp.sum(centers * centers, 1)[None, :])
    return jnp.argmin(d, axis=1).astype(jnp.int32), centers


@functools.partial(jax.jit, static_argnames=("k", "power_iters", "kmeans_iters"))
@highest_precision
def spectral_cluster(X: jnp.ndarray, k: int, key: jax.Array,
                     sigma: float = 0.5, power_iters: int = 60,
                     kmeans_iters: int = 25) -> jnp.ndarray:
    """Normalized-cuts spectral clustering on a gaussian affinity.

    Eigenvectors of the normalized affinity are found with orthogonal
    subspace (power) iteration — jit-friendly, no host eig — then kmeans in
    the embedding space. X: [N, D] -> labels [N].
    """
    n = X.shape[0]
    d2 = (jnp.sum(X * X, 1)[:, None]
          - 2.0 * jnp.dot(X, X.T, preferred_element_type=jnp.float32)
          + jnp.sum(X * X, 1)[None, :])
    A = jnp.exp(-d2 / (2.0 * sigma * sigma))
    deg = jnp.sum(A, axis=1)
    dinv = 1.0 / jnp.sqrt(deg + 1e-9)
    M = A * dinv[:, None] * dinv[None, :]  # normalized affinity

    V = jax.random.normal(key, (n, k))

    def body(_, V):
        V = jnp.dot(M, V, preferred_element_type=jnp.float32)
        Q, _ = jnp.linalg.qr(V)
        return Q

    V = lax.fori_loop(0, power_iters, body, V)
    rows = V / (jnp.linalg.norm(V, axis=1, keepdims=True) + 1e-9)
    labels, _ = kmeans(rows, k, jax.random.fold_in(key, 1),
                       iters=kmeans_iters)
    return labels


def cluster(embedding, k: int, method: str = "kmeans", key=None,
            quantile: float = 0.015):
    """Dispatch like the reference's `cluster` (segment_utils.py:13-36).

    method in {"kmeans", "spectral", "meanshift"}; embedding [N, D].
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    if method == "kmeans":
        return kmeans(embedding, k, key)[0]
    if method == "spectral":
        return spectral_cluster(embedding, k, key)
    if method == "meanshift":
        from .mean_shift import guard_mean_shift
        emb = embedding / (jnp.linalg.norm(embedding, axis=1,
                                           keepdims=True) + 1e-12)
        return guard_mean_shift(emb, quantile, key=key, iterations=30).labels
    raise ValueError(method)


def cluster_prob_softmax(embedding, centers):
    """Softmax membership over centers (reference: segment_utils.py:39-50).
    embedding [N, D], centers [C, D] -> [N, C]."""
    dots = jnp.dot(embedding, centers.T, preferred_element_type=jnp.float32)
    return jax.nn.softmax(dots, axis=1)


def cluster_prob_gaussian(embedding, centers, band_width):
    """Gaussian kernel membership (reference: segment_utils.py:52-61).
    Returns [C, N]."""
    dist = 2.0 - 2.0 * jnp.dot(centers, embedding.T,
                               preferred_element_type=jnp.float32)
    return (jnp.exp(-dist / 2.0 / band_width)
            / jnp.sqrt(2.0 * jnp.pi * band_width))


def cluster_prob_mutual(embedding, centers, bandwidth, if_normalize=False):
    """Temperature-softmax membership over centers, optionally min-max
    normalized per center (reference: segment_utils.py:64-76). Returns [C, N]."""
    dist = jnp.exp(jnp.dot(centers, embedding.T,
                           preferred_element_type=jnp.float32) / bandwidth)
    prob = dist / jnp.sum(dist, axis=0, keepdims=True)
    if if_normalize:
        prob = prob - jnp.min(prob, axis=1, keepdims=True)
        prob = prob / jnp.max(prob, axis=1, keepdims=True)
    return prob
