"""Slope-based op costs: time jit(op^1) vs jit(op^K) and difference out the
relay/fixed overhead that pollutes single-call timings on the axon tunnel."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N, D = 4, 10000, 128


def timed(fn, *args, reps=6):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], out)
    return (time.perf_counter() - t0) / reps * 1000


def slope(name, make, X, k1=1, k2=4):
    f1, f2 = make(k1), make(k2)
    t1, t2 = timed(f1, X), timed(f2, X)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name}: 1x {t1:.1f} ms, {k2}x {t2:.1f} ms -> "
          f"{per:.1f} ms/op/batch ({per / B:.2f} ms/op/shape)")


def main():
    from parsenet_tpu.ops.mean_shift import nms
    from parsenet_tpu.ops.pallas_kernels import mean_shift_iterations_pallas

    rng = np.random.RandomState(0)
    centers = rng.randn(12, D).astype(np.float32)
    lab = rng.randint(0, 12, (B, N))
    x = centers[lab] + 0.15 * rng.randn(B, N, D).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    X = jnp.asarray(x)
    bw = jnp.float32(0.12)

    def make_pallas(it):
        def mk(k):
            @jax.jit
            def f(e):
                for _ in range(k):
                    e = jax.vmap(lambda ee: mean_shift_iterations_pallas(
                        ee, bw, it))(e)
                return e
            return f
        return mk

    def mk_nms(k):
        @jax.jit
        def f(e):
            out = 0.0
            for i in range(k):
                out = out + jax.vmap(
                    lambda ee: nms(ee + out * 0, ee, bw)[1])(e)[0, 0]
            return out
        return f

    def mk_approx(k):
        @jax.jit
        def f(e):
            acc = 0.0
            for i in range(k):
                d = 2.0 - 2.0 * jnp.einsum(
                    "bnd,bmd->bnm", e[:, :5000] + acc * 0, e[:, :5000],
                    preferred_element_type=jnp.float32)
                kth = lax.approx_max_k(-d, 75, recall_target=0.99,
                                       aggregate_to_topk=True)[0][..., -1]
                acc = acc + jnp.mean(kth)
            return acc
        return f

    def mk_sort(k):
        @jax.jit
        def f(e):
            acc = 0.0
            for i in range(k):
                d = 2.0 - 2.0 * jnp.einsum(
                    "bnd,bmd->bnm", e[:, :5000] + acc * 0, e[:, :5000],
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.mean(jnp.sort(d, axis=-1)[..., 75])
            return acc
        return f

    slope("pallas ms 50 iters", make_pallas(50), X, 1, 3)
    slope("pallas ms 10 iters", make_pallas(10), X, 1, 3)
    slope("nms", mk_nms, X, 1, 3)
    slope("subset dist+approx_max_k(75)", mk_approx, X, 1, 3)
    slope("subset dist+full sort", mk_sort, X, 1, 3)


if __name__ == "__main__":
    main()
