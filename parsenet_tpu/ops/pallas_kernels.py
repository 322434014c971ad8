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

    scalar_ref (VMEM [1, 128]): [inv2b2, n_valid, ...pad] — kept in VMEM
    rather than SMEM so jax.vmap's pallas batching rule (which prepends a
    batch dimension to every block) stays legal; m_ref [ROW_TILE, D];
    x_ref [N_pad, D] (full cloud in VMEM); out_ref [ROW_TILE, D].
    """
    inv2b2 = scalar_ref[0, 0]
    n_valid = scalar_ref[0, 1].astype(jnp.int32)
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
    scalars = jnp.zeros((1, 128), jnp.float32)
    scalars = scalars.at[0, 0].set(jnp.asarray(inv2b2, jnp.float32))
    scalars = scalars.at[0, 1].set(jnp.float32(n))
    n_rows = m_p.shape[0]
    out = pl.pallas_call(
        _ms_step_kernel,
        grid=(n_rows // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
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


def _make_ms_multi_kernel(bf16_dots: bool, early_exit: bool = False,
                          static_iters: int = 0):
    """ALL mean-shift iterations for one ROW_TILE block, fully in VMEM.

    Each shifted point's trajectory depends only on its own state and the
    (fixed) cloud X, so row tiles iterate independently: the m tile never
    round-trips through HBM between iterations.
    scalar_ref (VMEM [1, 128]): [inv2b2, n_valid, iterations, ...].

    bf16_dots casts the matmul OPERANDS to bf16 (f32 accumulation on the
    MXU): ~4x matmul throughput. The shift map is contractive toward the
    cluster modes, so the reduced operand precision perturbs trajectories
    without moving the fixed points; callers must validate labels match the
    f32 path for their data (the bench does).
    """
    dot_t = jnp.bfloat16 if bf16_dots else jnp.float32

    def kernel(scalar_ref, m_ref, x_ref, out_ref):
        inv2b2 = scalar_ref[0, 0]
        n_valid = scalar_ref[0, 1].astype(jnp.int32)
        iterations = scalar_ref[0, 2].astype(jnp.int32)
        tol = scalar_ref[0, 3]
        n_pad = x_ref.shape[0]
        tm, d = m_ref.shape

        def one_iter(m):
            md = m.astype(dot_t)

            def body(j, carry):
                acc, rs = carry
                xj = x_ref[pl.ds(j * COL_TILE, COL_TILE), :]
                xjd = xj.astype(dot_t)
                s = jnp.dot(md, xjd.T, preferred_element_type=jnp.float32)
                k = jnp.exp((2.0 * s - 2.0) * inv2b2)
                col = (j * COL_TILE
                       + lax.broadcasted_iota(jnp.int32, (1, COL_TILE), 1))
                k = jnp.where(col < n_valid, k, 0.0)
                acc = acc + jnp.dot(k.astype(dot_t), xjd,
                                    preferred_element_type=jnp.float32)
                rs = rs + jnp.sum(k, axis=1, keepdims=True)
                return acc, rs

            acc0 = jnp.zeros((tm, d), jnp.float32)
            rs0 = jnp.zeros((tm, 1), jnp.float32)
            acc, rs = lax.fori_loop(0, n_pad // COL_TILE, body, (acc0, rs0))
            new_m = acc / (rs + 1e-12)
            norm = jnp.sqrt(jnp.sum(new_m * new_m, axis=1, keepdims=True))
            return new_m / (norm + 1e-12)

        # early_exit=False (the default): STATIC fori_loop. A
        # data-dependent while_loop makes the kernel's duration dynamic,
        # which stalls the streamed axon runtime's pipeline even when the
        # loop work is unchanged — static trip counts keep it full.
        if not early_exit:
            # static_iters is a PYTHON int: the trip count is baked into
            # the kernel (a traced bound would lower to a while again)
            out_ref[:] = lax.fori_loop(
                0, static_iters, lambda i, m: one_iter(m), m_ref[:],
                unroll=False)
        else:
            def w_cond(state):
                it, _, delta = state
                return (it < iterations) & (delta > tol)

            def w_body(state):
                it, m, _ = state
                new_m = one_iter(m)
                delta = jnp.max(jnp.abs(new_m - m))
                return it + 1, new_m, delta

            _, m_fin, _ = lax.while_loop(
                w_cond, w_body,
                (jnp.int32(0), m_ref[:], jnp.float32(jnp.inf)))
            out_ref[:] = m_fin

    return kernel


@functools.lru_cache(maxsize=None)
def _ms_kernel_for(bf16_dots: bool, early_exit: bool, static_iters: int):
    return _make_ms_multi_kernel(bf16_dots, early_exit, static_iters)


@functools.partial(jax.jit, static_argnames=("iterations", "interpret",
                                             "bf16_dots", "tol"))
def mean_shift_iterations_pallas(X: jnp.ndarray, bandwidth: jnp.ndarray,
                                 iterations: int,
                                 interpret: bool = False,
                                 bf16_dots: bool = False,
                                 tol: float = 0.0) -> jnp.ndarray:
    """Drop-in for ops.mean_shift.mean_shift_iterations (gaussian kernel,
    forward only — wrap in stop_gradient on differentiable paths). The whole
    iteration loop runs inside one kernel per row tile; tol > 0 exits a row
    tile early once its max update falls below tol (tol = 0 keeps the exact
    fixed-count reference semantics)."""
    inv2b2 = 1.0 / (2.0 * bandwidth * bandwidth)
    n, d = X.shape
    d_pad = max(d, 128)
    x_p = _pad_to(_pad_to(X, max(ROW_TILE, COL_TILE), 0), d_pad, 1)
    scalars = jnp.zeros((1, 128), jnp.float32)
    scalars = scalars.at[0, 0].set(jnp.asarray(inv2b2, jnp.float32))
    scalars = scalars.at[0, 1].set(jnp.float32(n))
    scalars = scalars.at[0, 2].set(jnp.float32(iterations))
    scalars = scalars.at[0, 3].set(jnp.float32(tol))
    n_rows = x_p.shape[0]
    out = pl.pallas_call(
        _ms_kernel_for(bf16_dots, tol > 0.0, int(iterations)),
        grid=(n_rows // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, x_p.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((x_p.shape[0], x_p.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, x_p.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x_p.shape, jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * iterations * n_rows * x_p.shape[0] * d_pad,
            bytes_accessed=(n_rows + x_p.shape[0]) * d_pad * 4,
            transcendentals=iterations * n_rows * x_p.shape[0],
        ),
    )(scalars, x_p, x_p)
    return out[:n, :d]


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# In-VMEM auction assignment.
#
# The XLA while_loop auction costs ~0.5 ms per round on the serial path
# (each round is ~6 tiny [n, n] kernels; per-kernel dispatch dominates at
# n = 50). Running ALL rounds inside one kernel keeps the whole state in
# VMEM: a round becomes a handful of [n, n] vector ops, so the typical
# 3-35-round solve drops from ~17 ms to microseconds. Same algorithm as
# ops.hungarian: aggressive first-price bids, escalating eps, parking
# bonus handled by the caller (it is baked into the benefit matrix).
# ---------------------------------------------------------------------------

_AUCTION_NEG = -1e9
_AUCTION_ROUNDS = 512  # kernel round cap: with eps escalation every tested
# instance family terminates well inside it (realistic SIOU 3-35 rounds,
# random dense 50x50 ~500); callers asking for more fall through to the
# rank-fill completion in ops.hungarian.solve_lap.


def _make_auction_kernel(rounds: int):
    """Auction kernel with a STATIC trip count = min(max_iter, cap): a
    data-dependent while would make the kernel's duration dynamic and stall
    the streamed runtime's pipeline; once everyone is assigned a round is a
    provable no-op (no bids), so extra rounds only cost predictable math."""

    def _auction_kernel(benefit_ref, scalar_ref, out_ref):
        n = benefit_ref.shape[0]
        benefit = benefit_ref[:]
        eps0 = scalar_ref[0, 0]
        esc_every = scalar_ref[0, 1].astype(jnp.int32)
        esc = scalar_ref[0, 2]
        col = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        pid = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

        def body(st):
            obj, prices, it, eps = st      # obj [n,1] i32, prices [1,n] f32
            unas = obj < 0
            vals = benefit - prices        # [n, n]
            m1 = jnp.max(vals, axis=1, keepdims=True)
            a1 = jnp.argmax(vals, axis=1).reshape(n, 1)
            # f32 one-hot masks: Mosaic rejects i1 select/sum chains, and
            # all index values here are < 2^24, exactly representable in f32
            oh = (col == a1).astype(jnp.float32)
            m2 = jnp.max(vals - oh * 2.0 * jnp.abs(_AUCTION_NEG), axis=1,
                         keepdims=True)
            price_a1 = jnp.sum(oh * prices, axis=1, keepdims=True)
            bid = jnp.where(unas, price_a1 + (m1 - m2) + eps, _AUCTION_NEG)
            bid_mat = oh * bid + (1.0 - oh) * _AUCTION_NEG
            obj_best = jnp.max(bid_mat, axis=0, keepdims=True)     # [1, n]
            winner_f = jnp.argmax(bid_mat, axis=0).reshape(1, n).astype(
                jnp.float32)
            got_bid_f = (obj_best > _AUCTION_NEG / 2).astype(jnp.float32)
            own_oh = (col == obj).astype(jnp.float32)  # -1 -> all-zero row
            got_owned = jnp.sum(own_oh * got_bid_f, axis=1,
                                keepdims=True) > 0
            winner_owned = jnp.sum(own_oh * winner_f, axis=1,
                                   keepdims=True).astype(jnp.int32)
            evicted = (obj >= 0) & got_owned & (winner_owned != pid)
            obj = jnp.where(evicted, -1, obj)
            winner_a1 = jnp.sum(oh * winner_f, axis=1,
                                keepdims=True).astype(jnp.int32)
            win = unas & (winner_a1 == pid)
            obj = jnp.where(win, a1, obj)
            prices = got_bid_f * obj_best + (1.0 - got_bid_f) * prices
            it = it + 1
            eps = jnp.where(it % esc_every == 0, eps * esc, eps)
            return obj, prices, it, eps

        init = (jnp.full((n, 1), -1, jnp.int32),
                jnp.full((1, n), 0.0, jnp.float32),
                jnp.int32(0), eps0)
        obj, _, _, _ = lax.fori_loop(0, rounds,
                                     lambda i, st: body(st), init)
        out_ref[:] = obj

    return _auction_kernel


@functools.lru_cache(maxsize=None)
def _auction_kernel_for(rounds: int):
    return _make_auction_kernel(rounds)


@functools.partial(jax.jit, static_argnames=("max_iter", "interpret"))
def auction_assign_pallas(benefit: jnp.ndarray, eps0: float,
                          esc_every: int, esc: float, max_iter: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Forward auction on a prepared benefit matrix [n, n] (higher =
    better), entirely inside one kernel. The kernel's STATIC trip count is
    min(max_iter, _AUCTION_ROUNDS): max_iter below the cap is honored
    exactly; budgets above it are clamped (eps escalation terminates every
    tested instance family well inside the cap). Returns obj_of_person [n]
    int32 (-1 on bailout; caller completes)."""
    n = benefit.shape[0]
    n_pad = max(8, -(-n // 8) * 8)
    b = jnp.full((n_pad, n_pad), jnp.float32(-1e6))
    b = b.at[:n, :n].set(benefit.astype(jnp.float32))
    if n_pad > n:
        # padding persons park on their own padding objects instantly
        pad = jnp.arange(n, n_pad)
        b = b.at[pad, pad].set(-1e6 + 1.0)
    scalars = jnp.zeros((1, 128), jnp.float32)
    scalars = scalars.at[0, 0].set(jnp.float32(eps0))
    scalars = scalars.at[0, 1].set(jnp.asarray(esc_every, jnp.float32))
    scalars = scalars.at[0, 2].set(jnp.float32(esc))
    out = pl.pallas_call(
        _auction_kernel_for(min(int(max_iter), _AUCTION_ROUNDS)),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
    )(b, scalars)
    return out[:n, 0]


# ---------------------------------------------------------------------------
# Fused min-squared-distance (the chamfer core).
#
# The XLA path materializes [chunk, M] distance matrices in HBM (at eval, M
# is 200k+ surface samples -> gigabytes of traffic); this kernel keeps each
# [TQ, TX] distance tile in VMEM and folds it straight into a running min.
# C=3 coordinates are expanded with VPU broadcasts — exact f32, no MXU
# precision compromise.
# ---------------------------------------------------------------------------

Q_TILE = 256
X_TILE = 1024
_BIG = 1e30


def _min_sqdist_kernel(q_ref, xt_ref, mask_ref, out_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # Quadratic expansion with the cross term on the MXU: the elementwise
    # (q - x)^2 form costs ~9 VPU ops per output element and was the
    # pipeline's largest VPU bill (~40 ms/shape over the 10k x 205k coverage
    # pair); one HIGHEST-precision [TQ,3]x[3,TX] dot keeps f32 fidelity
    # (6-pass bf16 decomposition) at MXU rates. d >= 0 up to f32 rounding.
    q = q_ref[:]
    xt = xt_ref[:]
    qq = jnp.sum(q * q, axis=1, keepdims=True)          # [TQ, 1]
    xx = jnp.sum(xt * xt, axis=0, keepdims=True)        # [1, TX]
    s = lax.dot_general(q, xt, (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    d = qq - 2.0 * s + xx
    d = d + mask_ref[0, :][None, :]      # +BIG on padded/masked targets
    tile_min = jnp.min(d, axis=1, keepdims=True)
    tile_idx = (j * d.shape[1]
                + jnp.argmin(d, axis=1)[:, None]).astype(jnp.int32)
    better = tile_min < out_ref[:]
    idx_ref[:] = jnp.where(better, tile_idx, idx_ref[:])
    out_ref[:] = jnp.where(better, tile_min, out_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def min_sqdist_with_idx_pallas(q: jnp.ndarray, x: jnp.ndarray,
                               x_mask: jnp.ndarray | None = None,
                               interpret: bool = False):
    """Per-query (min squared distance, argmin index). q: [N,3], x: [M,3]."""
    n, m = q.shape[0], x.shape[0]
    q_p = _pad_to(q, Q_TILE, 0)
    x_p = _pad_to(x, X_TILE, 0)
    mask = jnp.zeros((m,), jnp.float32) if x_mask is None else \
        jnp.where(x_mask > 0, 0.0, _BIG).astype(jnp.float32)
    mask = jnp.pad(mask, (0, x_p.shape[0] - m), constant_values=_BIG)
    out, idx = pl.pallas_call(
        _min_sqdist_kernel,
        grid=(q_p.shape[0] // Q_TILE, x_p.shape[0] // X_TILE),
        in_specs=[
            pl.BlockSpec((Q_TILE, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, X_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, X_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Q_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_p.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((q_p.shape[0], 1), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=9 * q_p.shape[0] * x_p.shape[0],
            bytes_accessed=(q_p.shape[0] + 2 * x_p.shape[0]) * 12,
            transcendentals=0,
        ),
    )(q_p, x_p.T, mask[None, :])
    return out[:n, 0], jnp.clip(idx[:n, 0], 0, m - 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def min_sqdist_fused(q, x, x_mask=None, interpret: bool = False):
    """Differentiable fused min squared distance [N]: pallas forward with a
    subgradient VJP through the argmin (the same gradient the XLA min gives
    almost everywhere)."""
    d, _ = min_sqdist_with_idx_pallas(q, x, x_mask, interpret=interpret)
    return d


def _msf_fwd(q, x, x_mask, interpret):
    d, idx = min_sqdist_with_idx_pallas(q, x, x_mask, interpret=interpret)
    return d, (q, x, idx)


def _msf_bwd(interpret, res, g):
    q, x, idx = res
    xa = x[idx]                      # [N, 3] nearest target per query
    diff = 2.0 * (q - xa) * g[:, None]
    dq = diff
    dx = jnp.zeros_like(x).at[idx].add(-diff)
    return dq, dx, None


min_sqdist_fused.defvjp(_msf_fwd, _msf_bwd)
