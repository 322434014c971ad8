"""Slope-based decomposition of the DGCNN forward's 93 ms/shape:
kNN stages vs EdgeConv gather+reduce vs MLP tail, plus candidate variants
(bf16 distances, unchunked selection, lower recall)."""
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

B, N, C, K = 4, 10000, 64, 80


def timed(fn, *args, reps=6):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], out)
    return (time.perf_counter() - t0) / reps * 1000


def slope(name, mk, *args):
    t1, t2 = timed(mk(1), *args), timed(mk(2), *args)
    print(f"{name}: 1x {t1:.0f} 2x {t2:.0f} -> {t2 - t1:.1f} ms/batch "
          f"({(t2 - t1) / B:.2f} ms/shape)")


def main():
    from parsenet_tpu.ops import knn as knn_ops

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    x6 = jnp.asarray(rng.randn(B, N, 6).astype(np.float32))

    def mk_knn(k, **kw):
        @jax.jit
        def f(a):
            out = knn_ops.knn(a, k1=K, k2=K, **kw)
            for _ in range(k - 1):
                out = knn_ops.knn(a + 1e-12 * out[0, 0, 0], k1=K, k2=K, **kw)
            return out
        return f

    def mk_knn_pn(k):
        @jax.jit
        def f(a):
            out = knn_ops.knn_points_normals(a, k1=K, k2=K)
            for _ in range(k - 1):
                out = knn_ops.knn_points_normals(a + 1e-12 * out[0, 0, 0],
                                                 k1=K, k2=K)
            return out
        return f

    def mk_knn_unchunked(k, prec):
        @jax.jit
        def f(a):
            def one(xs):
                if prec == "bf16":
                    s = xs.astype(jnp.bfloat16)
                    neg = 2.0 * jnp.dot(s, s.T,
                                        preferred_element_type=jnp.float32)
                else:
                    neg = 2.0 * jnp.dot(xs, xs.T,
                                        preferred_element_type=jnp.float32)
                neg = neg - jnp.sum(xs * xs, -1)[None, :]
                return lax.approx_max_k(neg, K, recall_target=0.95)[1]
            out = jax.vmap(one)(a)
            return out

        @jax.jit
        def g(a):
            out = f(a)
            out2 = f(a + 1e-12 * out[0, 0, 0])
            return out2
        return g if k == 2 else f

    def mk_gather_reduce(k):
        idx = knn_ops.knn(x, k1=K, k2=K)
        idx = jax.block_until_ready(jax.jit(lambda a: a)(idx))

        @jax.jit
        def f(a):
            acc = 0.0
            for i in range(k):
                g = jax.vmap(lambda ab, ib: ab[ib])(a + acc * 0, idx)
                acc = acc + jnp.sum(jnp.max(g, 2)) + jnp.sum(jnp.sum(g, 2)) \
                    + jnp.sum(jnp.sum(g * g, 2)) + jnp.sum(jnp.min(g, 2))
            return acc
        return f

    def mk_edgeconv(k):
        from parsenet_tpu.models.dgcnn import EdgeConv
        ec = EdgeConv(64, groups=2)
        idx = knn_ops.knn(x, k1=K, k2=K)
        idx = jax.block_until_ready(jax.jit(lambda a: a)(idx))
        vars_ = ec.init(jax.random.PRNGKey(0), x, idx)

        @jax.jit
        def f(a):
            out = ec.apply(vars_, a, idx)
            for _ in range(k - 1):
                out = ec.apply(vars_, a + 1e-12 * out[0, 0, 0], idx)
            return out
        return f

    slope("knn 64ch (current chunked approx)", mk_knn, x)
    slope("knn 64ch exact top_k", lambda k: mk_knn(k, exact=True), x)
    slope("knn_points_normals (layer1)", mk_knn_pn, x6)
    slope("knn 64ch unchunked f32", lambda k: mk_knn_unchunked(k, "f32"), x)
    slope("knn 64ch unchunked bf16", lambda k: mk_knn_unchunked(k, "bf16"), x)
    slope("gather + 4 reductions", mk_gather_reduce, x)
    slope("EdgeConv full (fused)", mk_edgeconv, x)


if __name__ == "__main__":
    main()
