"""Linear assignment on device.

The reference calls the C++ `lapsolver.solve_dense` from Python on 50x50
relaxed-IoU cost matrices (src/fitting_utils.py:362-376,
src/segment_utils.py:173), forcing a device->host sync inside the training
step. Here the assignment runs on the TPU itself as a parallel (Jacobi)
auction (Bertsekas), fully jit/vmap-compatible: fixed-shape [n, n] tensor
ops in a bounded while_loop.

Design notes (what makes this fast on the padded SIOU matrices):

- Padded K_MAX cost matrices are mostly UNIFORM rows (an empty predicted
  segment has IoU 0, hence identical cost, against every column). Identical
  rows are the auction's worst case: they fight an O(m^2)-round price war at
  +eps per round. Each uniform row therefore gets a tiny diagonal bonus
  (beta = 2e-5 on its own column) so the m identical rows park on m distinct
  columns in a single round. For any assignment the bonus perturbs the total
  cost by at most n*beta = 1e-3, far below real IoU gaps, so the matching on
  the non-degenerate rows is preserved.
- A column-linear tie-breaker (1e-7 * j) strictly orders otherwise-identical
  columns; being column-linear it shifts every perfect matching by the same
  constant, so it is exactness-neutral at any magnitude.
- ONE phase from zero prices, not coarse-to-fine eps scaling. eps-scaling
  with persistent prices is what the textbook prescribes for SQUARE dense
  problems, but here the coarse phases leave stale prices whose granularity
  (eps_coarse) swamps the parking bonus, re-creating the musical-chairs
  cascade in the fine phase (measured: ~4,200 serial rounds). From zero
  prices the aggressive first-price bid (v1 - v2 jump) resolves every
  non-tied contest immediately: realistic SIOU instances finish in < 10
  rounds, random dense 50x50 in a few hundred.
- eps ESCALATES (x8 every 150 rounds) instead of descending: adversarial
  near-tie instances that would war at +eps/round get their precision
  coarsened until they terminate, with the standard n*eps_final optimality
  bound degrading gracefully (measured <= 1.1e-3 cost error on worst-case
  near-tie matrices, exact on realistic ones). Any terminating square
  auction satisfies eps-complementary-slackness, so the bound holds no
  matter how eps evolved.
- Rows still unassigned at the max_iter bailout (and the uniform rows, which
  never bid better than their parking spot is worth) are completed onto the
  leftover columns by rank, so the result is ALWAYS a valid permutation —
  the previous implementation could return -1 rows when the iteration
  budget ran out mid-war.

Tests verify cost agreement with scipy on random, padded-SIOU-structured,
and near-tie instances. `solve_lap_host` is the exact host fallback (scipy)
for non-jit code paths.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG = -1e9
_TIE = 1e-7     # column-linear tie-breaker slope (exactness-neutral)
_BETA = 2e-5    # diagonal parking bonus for uniform rows
_EPS0 = 1e-5    # initial bid increment; n*eps optimality slack
_ESC_EVERY = 150  # rounds between eps escalations
_ESC = 8.0      # eps escalation factor


_UNROLL = 6  # auction rounds per while_loop iteration: the runtime's
# per-iteration overhead dominates the tiny [n, n] round ops (measured
# ~0.5 ms/round vmapped on the tunnel at n = 50); once every person is
# assigned a round is a provable no-op (no bids), so running a few extra
# rounds inside one loop step trades free math for serial latency.


def _auction(benefit: jnp.ndarray, eps0: float,
             max_iter: int) -> jnp.ndarray:
    """Forward auction from zero prices with escalating eps.

    Returns obj_of_person [n] (may contain -1 on max_iter bailout).
    """
    n = benefit.shape[0]

    def cond(state):
        obj_of_person, _, it, _ = state
        return jnp.any(obj_of_person < 0) & (it < max_iter)

    def one_round(state):
        obj_of_person, prices, it, eps = state
        rows = jnp.arange(n)
        unassigned = obj_of_person < 0
        vals = benefit - prices[None, :]
        top2, top2_idx = lax.top_k(vals, 2)
        best_j = top2_idx[:, 0]
        bid = prices[best_j] + (top2[:, 0] - top2[:, 1]) + eps
        bid = jnp.where(unassigned, bid, _NEG)
        # person x object bid matrix; objects pick their best bidder
        bid_mat = jnp.full((n, n), _NEG, benefit.dtype)
        bid_mat = bid_mat.at[rows, best_j].set(bid)
        obj_best = jnp.max(bid_mat, axis=0)
        obj_winner = jnp.argmax(bid_mat, axis=0)
        got_bid = obj_best > _NEG / 2
        # evict previous owners of re-auctioned objects (gather-side, no
        # scatter conflicts)
        owned = jnp.clip(obj_of_person, 0)
        evicted = (obj_of_person >= 0) & got_bid[owned] & (obj_winner[owned] != rows)
        obj_of_person = jnp.where(evicted, -1, obj_of_person)
        # award each winning bidder its object
        win = (bid > _NEG / 2) & (obj_winner[best_j] == rows) & got_bid[best_j]
        obj_of_person = jnp.where(win, best_j, obj_of_person)
        prices = jnp.where(got_bid, obj_best, prices)
        it = it + 1
        eps = jnp.where(it % _ESC_EVERY == 0, eps * _ESC, eps)
        return obj_of_person, prices, it, eps

    def body(state):
        for _ in range(_UNROLL):
            state = one_round(state)
        return state

    init = (jnp.full((n,), -1, jnp.int32), jnp.zeros((n,), benefit.dtype),
            jnp.int32(0), jnp.asarray(eps0, benefit.dtype))
    obj_of_person, _, _, _ = lax.while_loop(cond, body, init)
    return obj_of_person


@functools.partial(jax.jit, static_argnames=("max_iter",))
def solve_lap(cost: jnp.ndarray, max_iter: int = 3000) -> jnp.ndarray:
    """Minimum-cost perfect matching of a square cost matrix [n, n].

    Returns col_of_row [n] int32 (object assigned to each row; always a
    valid permutation, never -1). Use jnp.argsort to invert if row_of_col
    is needed.
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    row_span = jnp.max(cost, axis=1) - jnp.min(cost, axis=1)
    uniform = row_span <= 1e-6
    tie = _TIE * jnp.arange(n, dtype=jnp.float32)[None, :]
    park = _BETA * uniform[:, None] * jnp.eye(n, dtype=jnp.float32)
    benefit = -(cost + tie) + park
    if jax.default_backend() == "tpu":
        # whole auction inside one VMEM kernel: the XLA while_loop pays
        # ~0.5 ms of kernel-dispatch overhead per round at n = 50
        from .pallas_kernels import auction_assign_pallas
        assignment = auction_assign_pallas(benefit, _EPS0, _ESC_EVERY,
                                           _ESC, max_iter)
    else:
        assignment = _auction(benefit, _EPS0, max_iter)
    # Complete any still-unassigned rows (max_iter bailout mid-price-war)
    # onto the leftover columns, r-th such row -> r-th free column: the
    # result is always a valid permutation.
    assigned = assignment >= 0
    col_taken = jnp.zeros((n,), bool).at[
        jnp.where(assigned, assignment, n)].set(True, mode="drop")
    free_cols = jnp.sort(jnp.where(col_taken, n, jnp.arange(n)))
    fill_rank = jnp.cumsum(~assigned) - 1
    fill = free_cols[jnp.clip(fill_rank, 0, n - 1)]
    return jnp.where(assigned, assignment, fill).astype(jnp.int32)


def solve_lap_host(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact Hungarian on host via scipy (drop-in for lapsolver.solve_dense)."""
    from scipy.optimize import linear_sum_assignment
    rids, cids = linear_sum_assignment(np.asarray(cost))
    return rids.astype(np.int32), cids.astype(np.int32)
