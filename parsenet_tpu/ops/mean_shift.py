"""Differentiable mean-shift clustering on the unit hypersphere.

TPU-native re-design of reference src/mean_shift.py. Key differences:

* The shift iteration is a `lax.fori_loop` over a fixed iteration count; the
  kernel matrix K = exp((<m, x> - 1)/b^2) is numerically safe by construction
  (exponent <= 0 on the sphere) — no guard_exp needed.
* Non-max suppression (reference: src/mean_shift.py:139-179) is fixed-shape:
  the numpy `unique` + scatter round-trips become masked argmax/segment-sum,
  and cluster ids are compacted with a cumulative-sum ranking so results are
  identical but the whole pipeline stays inside one jit.
* The bandwidth-escalation guard (double the quantile until <= max_clusters;
  reference: src/mean_shift.py:81-96, src/residual_utils.py:69-84) is a
  bounded `lax.while_loop`. The quantile-th neighbour distance is read from a
  pre-sorted distance matrix so the loop can change the quantile dynamically.

Shapes: X is [N, D] (unit-norm rows). All outputs are fixed-shape; the number
of clusters is returned as a traced scalar.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.guards import guard_sqrt
from ..core.guards import highest_precision


class MeanShiftResult(NamedTuple):
    shifted: jnp.ndarray      # [N, D] shifted (cluster-center) embedding per point
    center_mask: jnp.ndarray  # [N] 1.0 where point index is a surviving center
    labels: jnp.ndarray       # [N] int32 compacted cluster id per point
    bandwidth: jnp.ndarray    # scalar
    num_clusters: jnp.ndarray # scalar int32


@highest_precision
def _subset_sqdist(X: jnp.ndarray, key: Optional[jax.Array],
                   num_samples: int) -> jnp.ndarray:
    """Pairwise sq. distances of a random subset [S, S] (unsorted)."""
    n = X.shape[0]
    s = min(num_samples, n)
    if key is not None and s < n:
        idx = jax.random.permutation(key, n)[:s]
        Xs = X[idx]
    else:
        Xs = X[:s]
    return 2.0 - 2.0 * jnp.dot(Xs, Xs.T, preferred_element_type=jnp.float32)


def _sorted_subset_sqdist(X: jnp.ndarray, key: Optional[jax.Array],
                          num_samples: int) -> jnp.ndarray:
    """Row-sorted pairwise sq. distances of a random subset [S, S] ascending."""
    return jnp.sort(_subset_sqdist(X, key, num_samples), axis=-1)


def _kth_smallest_per_row(d: jnp.ndarray, k: jnp.ndarray,
                          iters: int = 28) -> jnp.ndarray:
    """Vectorized per-row k-th smallest (1-indexed, k may be traced) via
    binary search on the value: [S, S] -> [S].

    Used on the bandwidth-escalation path, where k = quantile * S doubles
    dynamically: a full row sort there costs ~20 ms/shape and — because the
    escalation while_loop is vmapped over the batch — is paid by EVERY lane
    whenever any one shape escalates. 28 halvings of a [0, 4] distance
    range converge below 1e-7, matching sorted-order semantics to f32
    precision at ~4x less cost, only when actually escalating.
    """
    s = d.shape[0]

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((d <= mid[:, None]).astype(jnp.float32), axis=1)
        ge = cnt >= k.astype(jnp.float32)
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo0 = jnp.zeros((s,), jnp.float32)
    hi0 = jnp.full((s,), 4.0 + 1e-3, jnp.float32)  # unit-sphere sqdist <= 4
    _, hi = lax.fori_loop(0, iters, body, (lo0, hi0))
    return hi


def _escalation_bandwidth(d: jnp.ndarray, quantile: jnp.ndarray,
                          min_bw: float = 0.003) -> jnp.ndarray:
    """Bandwidth at a TRACED quantile without sorting (escalation path)."""
    s = d.shape[0]
    k = jnp.clip((quantile * s).astype(jnp.int32), 1, s - 1)
    kth = _kth_smallest_per_row(d, k)
    bw = jnp.mean(guard_sqrt(kth, 1e-6))
    return jnp.maximum(bw, min_bw)


def _initial_bandwidth(d: jnp.ndarray, quantile: float,
                       min_bw: float = 0.003) -> jnp.ndarray:
    """Bandwidth at the STATIC initial quantile without a full row sort.

    The full [S, S] sort costs ~19 ms on chip but is only ever read at the
    initial quantile unless the escalation loop fires (rare on trained
    embeddings): here the k-th smallest per row comes from a partial
    selection instead. On TPU `lax.approx_max_k` (negated distances,
    aggregate_to_topk so the k-th entry is the true k-th of the candidate
    set) biases the k-th distance slightly high on rows with missed
    candidates; averaged over S rows the bandwidth shift stays well under
    1% at recall 0.95 (validated: labels identical to the exact-sort path
    on trained embeddings, plus the bench's quality floor). CPU keeps the
    exact lax.top_k.
    """
    s = d.shape[0]
    k = int(min(max(quantile * s, 1), s - 1))
    if jax.default_backend() == "tpu":
        neg_kth = lax.approx_max_k(-d, k, recall_target=0.95,
                                   aggregate_to_topk=True)[0][:, -1]
    else:
        neg_kth = lax.top_k(-d, k)[0][:, -1]
    bw = jnp.mean(guard_sqrt(-neg_kth, 1e-6))
    return jnp.maximum(bw, min_bw)


def bandwidth_from_sorted(sorted_d: jnp.ndarray, quantile: jnp.ndarray,
                          min_bw: float = 0.003) -> jnp.ndarray:
    """Mean over rows of the sqrt of the quantile-th NN distance
    (reference: src/mean_shift.py:115-137). `quantile` may be traced."""
    s = sorted_d.shape[0]
    k = jnp.clip((quantile * s).astype(jnp.int32), 1, s - 1)
    # reference takes the K smallest distances per row and uses the largest of
    # them == ascending-sorted index K-1 (the row's own zero distance occupies
    # index 0, matching torch.topk(largest=False) behaviour).
    kth = jnp.take_along_axis(sorted_d, jnp.full((s, 1), k - 1), axis=1)[:, 0]
    bw = jnp.mean(guard_sqrt(kth, 1e-6))
    return jnp.maximum(bw, min_bw)


@highest_precision
def mean_shift_iterations(X: jnp.ndarray, bandwidth: jnp.ndarray,
                          iterations: int, kernel: str = "gaussian") -> jnp.ndarray:
    """Fixed-count mean-shift updates (reference: src/mean_shift.py:45-79).

    new_m <- normalize(  (K @ X) / rowsum(K) ),
    K = exp(-(2 - 2 m.x) / 2 b^2)   (gaussian)  or Epanechnikov.
    The gaussian exponent is <= 0 so exp never overflows.
    """
    inv2b2 = 1.0 / (2.0 * bandwidth * bandwidth)

    def body(_, m):
        dots = jnp.dot(m, X.T, preferred_element_type=jnp.float32)
        if kernel == "gaussian":
            K = jnp.exp((2.0 * dots - 2.0) * inv2b2)
        else:  # epanechnikov
            K = jax.nn.relu(0.75 * (1.0 - (2.0 - 2.0 * dots) / (bandwidth ** 2)))
        denom = jnp.sum(K, axis=1, keepdims=True) + 1e-12
        new_m = jnp.dot(K, X, preferred_element_type=jnp.float32) / denom
        return new_m / (jnp.linalg.norm(new_m, axis=1, keepdims=True) + 1e-12)

    return lax.fori_loop(0, iterations, body, X)


@highest_precision
def nms(shifted: jnp.ndarray, X: jnp.ndarray, bandwidth: jnp.ndarray):
    """Fixed-shape non-max suppression (reference: src/mean_shift.py:139-179).

    Returns (center_mask [N], labels [N] int32 compacted, num_clusters).
    """
    n = X.shape[0]
    # nearest shifted-center for every input point
    scores = jnp.dot(shifted, X.T, preferred_element_type=jnp.float32)  # [N,N]
    member_of = jnp.argmax(scores, axis=0)  # dist = 2-2*score, so argmin dist
    counts = jnp.zeros((n,), jnp.float32).at[member_of].add(1.0)
    valid = counts > 0
    # centers within `bandwidth` of each other compete; the one with the most
    # members wins (reference uses dist < b on squared-distance scale).
    cdist = 2.0 - 2.0 * jnp.dot(shifted, shifted.T,
                                preferred_element_type=jnp.float32)
    nbrs = (cdist < bandwidth).astype(jnp.float32)
    winner = jnp.argmax(nbrs * counts[None, :], axis=1)  # [N]
    center_mask = jnp.zeros((n,), jnp.float32).at[winner].max(
        valid.astype(jnp.float32))
    # assign each point to its best surviving center, compacting ids by rank
    masked_scores = jnp.where(center_mask[:, None] > 0, scores, -jnp.inf)
    best_center = jnp.argmax(masked_scores, axis=0)  # [N] point-index of center
    rank = jnp.cumsum(center_mask).astype(jnp.int32) - 1  # [N]
    labels = rank[best_center]
    num_clusters = jnp.sum(center_mask).astype(jnp.int32)
    return center_mask, labels, num_clusters


@functools.partial(jax.jit, static_argnames=("quantile", "num_samples",
                                             "iterations",
                                             "kernel", "max_clusters",
                                             "max_doublings", "use_pallas",
                                             "attempt_iterations",
                                             "pallas_bf16", "pallas_tol",
                                             "pallas_interpret",
                                             "differentiable"))
def guard_mean_shift(X: jnp.ndarray, quantile: float,
                     key: Optional[jax.Array] = None,
                     num_samples: int = 5000, iterations: int = 10,
                     kernel: str = "gaussian", max_clusters: int = 49,
                     max_doublings: int = 8,
                     use_pallas: bool = False,
                     attempt_iterations: Optional[int] = None,
                     pallas_bf16: bool = False,
                     pallas_tol: float = 0.0,
                     pallas_interpret: bool = False,
                     differentiable: bool = True) -> MeanShiftResult:
    """Mean-shift with bandwidth escalation until <= max_clusters clusters
    (reference: src/mean_shift.py:81-96). Bounded while_loop, one compile.

    differentiable=True: the escalation loop runs cheap stop-gradient
    attempts to FIND the accepted bandwidth (lax.while_loop is not
    reverse-differentiable), then the accepted configuration is re-run once
    differentiably — matching the reference, where only the final accepted
    mean-shift pass carries gradients into the fitting loss.

    differentiable=False (inference): each attempt runs at the FULL
    iteration count — exactly the reference's guard, whose every doubling
    re-runs the complete mean-shift (src/mean_shift.py:81-96) — and its
    shifted embedding + NMS are carried through the loop as the result, so
    the common no-escalation case costs ONE mean-shift and ONE NMS instead
    of a throwaway attempt plus a full re-run (~19 ms/shape on the fused
    eval pipeline).
    """
    d_sub = lax.stop_gradient(_subset_sqdist(X, key, num_samples))
    X_ng = lax.stop_gradient(X)

    # attempt_iterations: cheaper escalation attempts (perf knob; the
    # accepted bandwidth is always re-run at the full `iterations`, and the
    # reference-default None keeps attempts at full strength too)
    att_iters = attempt_iterations or iterations

    if use_pallas and kernel == "gaussian":
        # fused flash-style TPU kernel (forward-only; inference path).
        # pallas_interpret=True runs it as interpreted jax ops so CPU tests
        # can exercise this exact code path.
        from .pallas_kernels import mean_shift_iterations_pallas
        shift_fn = lambda xx, bw, it: mean_shift_iterations_pallas(
            xx, bw, it, bf16_dots=pallas_bf16, tol=pallas_tol,
            interpret=pallas_interpret)
    else:
        shift_fn = lambda xx, bw, it: mean_shift_iterations(xx, bw, it, kernel)

    # quantile is a STATIC argname (all call sites pass Python floats), so
    # the initial bandwidth always uses the partial-selection fast path —
    # no full [S, S] row sort; only the (rare) escalation loop pays the
    # sort-free binary-search statistic at a traced quantile.
    q0 = jnp.asarray(quantile, jnp.float32)
    bw0 = _initial_bandwidth(d_sub, float(quantile))

    if not differentiable:
        def full(bw):
            shifted = shift_fn(X_ng, bw, iterations)
            center_mask, labels, k = nms(shifted, X_ng, bw)
            return shifted, center_mask, labels, k

        def cond_f(carry):
            i, q, bw, (_, _, _, k) = carry
            return (k > max_clusters) & (i < max_doublings)

        def body_f(carry):
            i, q, _, _ = carry
            q = q * 2.0
            # Sort-free k-th order statistic: this body is vmapped with
            # the batch, so when ANY lane escalates every lane pays for
            # it — the binary search costs ~4x less than a full row sort.
            bw = _escalation_bandwidth(d_sub, q)
            return i + 1, q, bw, full(bw)

        _, _, bw, (shifted, center_mask, labels, k) = lax.while_loop(
            cond_f, body_f, (jnp.int32(0), q0, bw0, full(bw0)))
        return MeanShiftResult(shifted, center_mask, labels, bw, k)

    def attempt(bw, it):
        shifted = shift_fn(X_ng, bw, it)
        _, _, k = nms(shifted, X_ng, bw)
        return k

    def cond(carry):
        i, q, bw, k = carry
        return (k > max_clusters) & (i < max_doublings)

    def body(carry):
        i, q, _, _ = carry
        q = q * 2.0
        bw = _escalation_bandwidth(d_sub, q)
        return i + 1, q, bw, attempt(bw, att_iters)

    _, _, bw, _ = lax.while_loop(
        # (Tried: running the initial attempt at the full iteration count
        # hoping XLA CSE would merge it with the accepted-bandwidth re-run
        # on no-grad paths — it does not; the graphs stay separate and the
        # bench lost 14 ms/shape. Use differentiable=False instead.)
        cond, body, (jnp.int32(0), q0, bw0, attempt(bw0, att_iters)))
    # The accepted re-run must carry gradients, and the Pallas kernel is
    # forward-only (no VJP) — so the differentiable final pass ALWAYS takes
    # the XLA path; use_pallas still accelerates the stop-gradient
    # escalation attempts above. (Differentiating shift_fn(X, ...) here
    # would be a TPU-only trace error.)
    shifted = mean_shift_iterations(X, bw, iterations, kernel)
    center_mask, labels, k = nms(lax.stop_gradient(shifted), X_ng, bw)
    return MeanShiftResult(shifted, center_mask, labels, bw, k)


@functools.partial(jax.jit, static_argnames=("num_samples", "iterations", "kernel"))
def mean_shift(X: jnp.ndarray, quantile: float,
               key: Optional[jax.Array] = None, num_samples: int = 5000,
               iterations: int = 10, kernel: str = "gaussian"):
    """Single mean-shift pass without NMS (reference: src/mean_shift.py:19-43
    with nms=False). Returns (shifted, bandwidth)."""
    sorted_d = lax.stop_gradient(_sorted_subset_sqdist(X, key, num_samples))
    bw = bandwidth_from_sorted(sorted_d, jnp.asarray(quantile, jnp.float32))
    return mean_shift_iterations(X, bw, iterations, kernel), bw
