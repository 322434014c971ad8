"""Eval-mode segment preprocessing for the spline decoders.

The reference, before decoding a spline segment at eval time
(src/primitive_forward.py:986-1036), (1) removes statistical outliers
(Open3D remove_statistical_outlier(nb_neighbors=20, std_ratio=0.5),
src/fitting_utils.py:704-710) and (2) resizes the segment to EXACTLY a_max
points (closed 1800 / open 1500) via up_sample_points_in_range
(src/fitting_utils.py:199-217): subsample without replacement if larger,
else repeatedly append 4-nearest-neighbour centroids (doubling) until
>= a_max and then subsample without replacement.

This module reproduces those semantics as fixed-shape jitted ops so the
whole eval pipeline stays in one XLA program:

* each segment's member points are gathered into a BUF-slot packed buffer
  with a uniformly random without-replacement selection (segments larger
  than BUF are uniformly subsampled — the reference would subsample them to
  a_max <= BUF anyway, so the final point set follows the same law; the
  outlier statistics are then computed on <= BUF points instead of the full
  segment, a documented approximation for segments > BUF points);
* statistical outlier removal runs masked inside the buffer (k = 20
  same-segment neighbours excluding self, mean sqrt-distance, population
  sigma threshold mu + 0.5 sigma — exactly cpp/outlier.cpp);
* NN-centroid doubling runs a fixed number of masked rounds, each appending
  the 4-NN centroids of the current (real + synthetic) set, stopping (via
  masking) once the count reaches a_max — like the reference's while loop;
* the final fixed-size output is a uniform without-replacement draw of
  a_max points (wrapping with replacement only in the degenerate case where
  even 6 doublings cannot reach a_max).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

BUF = 2048          # packed segment buffer (>= a_max_closed = 1800)
NB_NEIGHBORS = 20
STD_RATIO = 0.5
UPSAMPLE_ROUNDS = 6  # >= ceil(log2(1800 / (100 - outliers)))


def _nearest_k(neg_d: jnp.ndarray, k: int):
    """(values, idx) of the k largest entries per row of neg_d.

    Uses the TPU partial-reduce approx_max_k (the sort-based exact top_k
    dominates the preprocessing cost otherwise; recall 0.95 changes which
    near-neighbours average into a centroid / outlier statistic, which is
    immaterial for both uses). Exact on CPU."""
    if jax.default_backend() == "tpu":
        from .knn import APPROX_RECALL
        return lax.approx_max_k(neg_d, k, recall_target=APPROX_RECALL)
    return lax.top_k(neg_d, k)


def pack_segment(points: jnp.ndarray, member: jnp.ndarray,
                 key: jax.Array, buf: int = BUF):
    """Gather a uniformly random subset of member points to the front of a
    fixed [buf, 3] buffer. points [N, 3], member [N] bool.
    Returns (pts [buf, 3], m scalar int32 = min(#members, buf))."""
    n = points.shape[0]
    pri = jax.random.uniform(key, (n,)) + jnp.where(member, 0.0, 2.0)
    order = jnp.argsort(pri)[:buf]
    pts = points[order]
    m = jnp.minimum(jnp.sum(member.astype(jnp.int32)), buf)
    return pts, m


def statistical_inliers_packed(pts: jnp.ndarray, m: jnp.ndarray,
                               nb_neighbors: int = NB_NEIGHBORS,
                               std_ratio: float = STD_RATIO) -> jnp.ndarray:
    """Masked statistical-outlier flags on a packed buffer.

    pts [buf, 3] with the first m rows valid. Returns [buf] bool keep flags
    (padding rows return False). Mirrors cpp/outlier.cpp: mean distance to
    min(nb, m-1) nearest valid neighbours excluding self; keep if
    <= mu + std_ratio * sigma (population sigma over the m valid rows).
    """
    buf = pts.shape[0]
    idx = jnp.arange(buf)
    valid = idx < m
    d = (jnp.sum(pts * pts, -1, keepdims=True)
         - 2.0 * jnp.dot(pts, pts.T, preferred_element_type=jnp.float32)
         + jnp.sum(pts * pts, -1)[None, :])
    big = jnp.float32(1e30)
    d = jnp.where(valid[None, :] & valid[:, None], d, big)
    d = jnp.where(jnp.eye(buf, dtype=bool), big, d)
    nearest = -_nearest_k(-d, nb_neighbors)[0]          # [buf, nb] ascending
    k_eff = jnp.clip(m - 1, 1, nb_neighbors)
    use = jnp.arange(nb_neighbors)[None, :] < k_eff
    dist = jnp.sqrt(jnp.clip(nearest, 0.0, None))
    mean_dist = jnp.sum(jnp.where(use, dist, 0.0), axis=1) / k_eff
    mf = jnp.maximum(m.astype(jnp.float32), 1.0)
    mu = jnp.sum(jnp.where(valid, mean_dist, 0.0)) / mf
    var = jnp.sum(jnp.where(valid, (mean_dist - mu) ** 2, 0.0)) / mf
    thresh = mu + std_ratio * jnp.sqrt(var)
    # m <= nb+1 would leave k_eff < requested k; Open3D still filters, and so
    # do we (k is clamped identically)
    return valid & (mean_dist <= thresh)


def repack(pts: jnp.ndarray, keep: jnp.ndarray):
    """Move kept rows to the front (stable). Returns (pts, new_m)."""
    order = jnp.argsort(jnp.logical_not(keep), stable=True)
    return pts[order], jnp.sum(keep.astype(jnp.int32))


def nn_centroid_upsample(pts: jnp.ndarray, m: jnp.ndarray, a_max: jnp.ndarray,
                         rounds: int = UPSAMPLE_ROUNDS):
    """Fixed-round masked doubling: while count < a_max, append the centroid
    of each current point's 4 nearest neighbours (excluding self)
    (reference: src/fitting_utils.py:149-164, 199-217). pts [buf, 3] packed,
    m valid rows. Returns (pts, new_m)."""
    buf = pts.shape[0]
    idx = jnp.arange(buf)

    def cond(carry):
        _, m, r = carry
        return (r < rounds) & (m < a_max)

    def body(carry):
        pts, m, r = carry
        valid = idx < m
        d = (jnp.sum(pts * pts, -1, keepdims=True)
             - 2.0 * jnp.dot(pts, pts.T, preferred_element_type=jnp.float32)
             + jnp.sum(pts * pts, -1)[None, :])
        big = jnp.float32(1e30)
        d = jnp.where(valid[None, :] & valid[:, None], d, big)
        d = jnp.where(jnp.eye(buf, dtype=bool), big, d)
        nbr = _nearest_k(-d, 4)[1]                       # [buf, 4]
        cent = jnp.mean(pts[nbr], axis=1)                # [buf, 3]
        new_m = jnp.minimum(2 * m, buf)
        src = jnp.clip(idx - m, 0, buf - 1)
        appended = jnp.where(((idx >= m) & (idx < new_m))[:, None],
                             cent[src], pts)
        return appended, new_m, r + 1

    # while_loop (not fori): typical segments need only 1-3 doublings to
    # reach a_max, and under vmap the loop stops as soon as EVERY slot is
    # done — the fixed-6-round version paid the [buf, buf] distance + top-k
    # even after all slots were full (measured 2x the preprocess cost)
    pts, m, _ = lax.while_loop(cond, body, (pts, m, jnp.int32(0)))
    return pts, m


def draw_fixed(pts: jnp.ndarray, m: jnp.ndarray, n_out: int, key: jax.Array
               ) -> jnp.ndarray:
    """Uniform without-replacement draw of n_out rows from the first m
    (wraps with replacement if m < n_out). Returns [n_out, 3]."""
    buf = pts.shape[0]
    valid = jnp.arange(buf) < m
    pri = jax.random.uniform(key, (buf,)) + jnp.where(valid, 0.0, 2.0)
    order = jnp.argsort(pri)
    ranks = jnp.arange(n_out) % jnp.maximum(m, 1)
    return pts[order[ranks]]


@functools.partial(jax.jit, static_argnames=("n_out", "preprocess"))
def eval_segment_points(points: jnp.ndarray, member: jnp.ndarray,
                        a_max: jnp.ndarray, key: jax.Array,
                        n_out: int = 1800, preprocess: bool = True
                        ) -> jnp.ndarray:
    """Full eval-mode preprocessing of one segment: gather -> outlier
    removal -> NN-centroid upsample to a_max -> fixed draw of n_out rows
    (callers slice [:a_max_static] per decoder). points [N, 3], member [N]
    bool, a_max traced int (1800 closed / 1500 open)."""
    k1, k2 = jax.random.split(key)
    pts, m = pack_segment(points, member, k1)
    if preprocess:
        keep = statistical_inliers_packed(pts, m)
        pts, m = repack(pts, keep)
        pts, m = nn_centroid_upsample(pts, m, a_max)
        # Draw from the FULL post-upsample set (m may overshoot a_max when
        # a doubling lands past the target): the first a_max rows of a
        # uniform without-replacement permutation of all m rows are exactly
        # the reference's law — a_max drawn uniformly without replacement
        # from the whole doubled set (fitting_utils.py up_sample_points /
        # primitive_forward.py:986-1036). Truncating m to a_max first would
        # bias the draw toward original points (synthetic centroids are
        # appended last).
    return draw_fixed(pts, m, n_out, k2)
