#!/usr/bin/env python
"""Micro-probe: measured cost of the non-MXU primitives the roofline
attributes the DGCNN gap to (round-4 verdict task 4).

Times, on the current backend with per-iteration blocking fetches
(CLAUDE.md: block_until_ready on the last output under-reports on the
tunneled runtime):

  1. one [N, N] -> k=80 `lax.approx_max_k` at recall 0.85 / 0.95 and the
     exact `lax.top_k` — the partial-reduce top-k that runs 12x per
     batch-4 DGCNN forward (3 kNN layers x 4 shapes);
  2. the fused kNN chunk body (scores matmul + top-k), i.e. what
     ops.knn actually dispatches, at the bench chunk size;
  3. `gather_neighbors` on [N, 128] x [N, 80] — the random-row gather
     whose HBM traffic the EdgeConv fusion already minimizes.

Each timing is its own tiny jit program; the relay's ~30 ms fixed
dispatch latency is measured by a null program and subtracted.

Writes one JSON to --out (default artifacts/r5_topk_probe.json).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call, HOST-FETCHING a scalar every iteration.

    The tunneled runtime's block_until_ready returns before the program
    finishes (CLAUDE.md; the first version of this probe measured ~0 ms
    for every op that way). Each timed program therefore returns a scalar
    reduction of its result and we force a host fetch per iteration —
    execution is fully included, transfer is 4 bytes."""
    for _ in range(warmup):
        float(np.asarray(fn(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=80)
    ap.add_argument("--chunk", type=int, default=2_500)
    ap.add_argument("--out", default="artifacts/r5_topk_probe.json")
    args = ap.parse_args()
    n, k = args.n, args.k

    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.randn(n, n).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, 128).astype(np.float32))
    x64 = jnp.asarray(rng.randn(n, 64).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, size=(n, k)).astype(np.int32))

    # every program returns a SCALAR so the per-iteration host fetch is
    # 4 bytes; the reductions depend on the full result, so nothing is
    # dead-code-eliminated
    null = jax.jit(lambda a: a + 1.0)
    t_null = _timed(null, jnp.zeros(()))

    @jax.jit
    def topk_exact(s):
        return jnp.sum(jax.lax.top_k(s, k)[1])

    @functools.partial(jax.jit, static_argnames=("recall",))
    def topk_approx(s, recall):
        return jnp.sum(jax.lax.approx_max_k(s, k, recall_target=recall)[1])

    @functools.partial(jax.jit, static_argnames=("recall", "chunk"))
    def knn_body(x, recall, chunk):
        # exactly ops.knn._knn_single's chunked program shape
        xx = jnp.sum(x * x, axis=-1)

        def body(q):
            neg = 2.0 * jnp.dot(q, x.T,
                                preferred_element_type=jnp.float32)
            neg = neg - jnp.sum(q * q, -1, keepdims=True) - xx[None, :]
            return jax.lax.approx_max_k(neg, k, recall_target=recall)[1]

        qs = x.reshape(x.shape[0] // chunk, chunk, x.shape[1])
        return jnp.sum(jax.lax.map(body, qs))

    @jax.jit
    def gather(f, i):
        return jnp.sum(f[i])  # forces the [n, k, 128] gather

    @jax.jit
    def gather_reduce(f, i):
        g = f[i]
        return (jnp.sum(g) + jnp.sum(g * g) + jnp.sum(jnp.max(g, 1))
                + jnp.sum(jnp.min(g, 1)))

    out = {
        "backend": jax.default_backend(),
        "n": n, "k": k, "chunk": args.chunk,
        "null_dispatch_ms": round(t_null * 1e3, 2),
        "ms": {},
    }

    def rec(name, t):
        out["ms"][name] = round(max(t - t_null, 0.0) * 1e3, 2)
        print(f"{name}: {out['ms'][name]} ms (raw {t*1e3:.1f})")

    rec("topk_approx_r85", _timed(topk_approx, scores, 0.85))
    rec("topk_approx_r95", _timed(topk_approx, scores, 0.95))
    rec("topk_exact", _timed(topk_exact, scores))
    rec("knn_chunked_r85", _timed(knn_body, x64, 0.85, args.chunk))
    rec("gather_128", _timed(gather, feats, idx))
    rec("gather_reduce_128", _timed(gather_reduce, feats, idx))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
