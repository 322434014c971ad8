"""Linear assignment on device.

The reference calls the C++ `lapsolver.solve_dense` from Python on 50x50
relaxed-IoU cost matrices (src/fitting_utils.py:362-376,
src/segment_utils.py:173), forcing a device->host sync inside the training
step. Here the assignment runs on the TPU itself as an epsilon-scaled
parallel auction (Bertsekas), fully jit/vmap-compatible: fixed-shape [n, n]
tensor ops in a bounded while_loop. With the final epsilon < (min cost gap)/n
the result matches the exact Hungarian optimum; tests verify equality of the
assignment cost against scipy on random instances.

`solve_lap_host` is the exact host fallback (scipy) for non-jit code paths.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG = -1e9


def _auction_phase(benefit: jnp.ndarray, prices: jnp.ndarray, eps: float,
                   max_iter: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One auction phase at fixed eps. Returns (obj_of_person, prices)."""
    n = benefit.shape[0]

    def cond(state):
        obj_of_person, _, it = state
        return jnp.any(obj_of_person < 0) & (it < max_iter)

    def body(state):
        obj_of_person, prices, it = state
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
        return obj_of_person, prices, it + 1

    init = (jnp.full((n,), -1, jnp.int32), prices, jnp.int32(0))
    obj_of_person, prices, _ = lax.while_loop(cond, body, init)
    return obj_of_person, prices


@functools.partial(jax.jit, static_argnames=("max_iter",))
def solve_lap(cost: jnp.ndarray, max_iter: int = 3000) -> jnp.ndarray:
    """Minimum-cost perfect matching of a square cost matrix [n, n].

    Returns col_of_row [n] int32 (object assigned to each row). Use
    jnp.argsort to invert if row_of_col is needed.
    """
    n = cost.shape[0]
    # Column-linear tie-breaker: adding f(j) to column j shifts every perfect
    # matching's total cost by the same constant, so the optimal assignment
    # set is EXACTLY preserved — but identical columns (ubiquitous here:
    # empty segments in a padded K_MAX cost matrix) become strictly ordered,
    # which turns the auction's eps-increment tie fights into single-round
    # resolutions.
    tie = 1e-5 * jnp.arange(n, dtype=jnp.float32)[None, :]
    benefit = -(cost.astype(jnp.float32) + tie)
    prices = jnp.zeros((n,), jnp.float32)
    assignment = jnp.full((n,), -1, jnp.int32)
    # epsilon scaling: coarse-to-fine keeps iteration counts low and the
    # final eps guarantees near-exact optimality for [0,1]-scale costs.
    for eps in (0.02, 1e-3, 1e-5):
        assignment, prices = _auction_phase(benefit, prices, eps, max_iter)
    return assignment


def solve_lap_host(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact Hungarian on host via scipy (drop-in for lapsolver.solve_dense)."""
    from scipy.optimize import linear_sum_assignment
    rids, cids = linear_sum_assignment(np.asarray(cost))
    return rids.astype(np.int32), cids.astype(np.int32)
