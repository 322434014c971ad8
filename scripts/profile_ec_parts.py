"""Dissect the fused EdgeConv's 40 ms/shape: which sub-expression costs?"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N, C, K, G = 4, 10000, 64, 80, 2


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
    wd = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.1)
    wx = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.randn(C).astype(np.float32))
    bias = jnp.asarray(rng.randn(C).astype(np.float32))
    idx = knn_ops.knn(x, k1=K, k2=K)
    idx = jax.block_until_ready(jax.jit(lambda a: a)(idx))

    def body(a, upto):
        yd = a @ wd
        yx = a @ wx - yd
        g = jax.vmap(lambda ab, ib: ab[ib])(yd, idx)
        nb_sum = jnp.sum(g, 2)
        nb_sq = jnp.sum(g * g, 2)
        nb_max = jnp.max(g, 2)
        nb_min = jnp.min(g, 2)
        if upto == "reduce":
            return nb_sum + nb_sq + nb_max + nb_min
        e_sum = nb_sum + K * yx
        e_sq = nb_sq + 2.0 * yx * nb_sum + K * yx * yx
        denom = N * K * (C // G)
        mean = jnp.sum(e_sum.reshape(B, N, G, C // G), axis=(1, 3)) / denom
        m2 = jnp.sum(e_sq.reshape(B, N, G, C // G), axis=(1, 3)) / denom
        var = m2 - mean * mean
        inv = jax.lax.rsqrt(var + 1e-5)
        inv_c = jnp.repeat(inv, C // G, axis=1)
        mean_c = jnp.repeat(mean, C // G, axis=1)
        aa = scale[None, :] * inv_c
        bb = bias[None, :] - mean_c * aa
        if upto == "stats":
            return aa + bb
        ext = jnp.where(aa[:, None, :] >= 0, nb_max, nb_min) + yx
        return jax.nn.leaky_relu(aa[:, None, :] * ext + bb[:, None, :], 0.2)

    def mk(upto):
        def m(k):
            @jax.jit
            def f(a):
                out = body(a, upto)
                for _ in range(k - 1):
                    out = body(a + 1e-12 * out.ravel()[0], upto)
                return out
            return f
        return m

    def mk_old(k):
        # materializing reference formulation
        def one(a):
            yd = a @ wd
            yx = a @ wx - yd
            edge = jax.vmap(lambda ab, ib: ab[ib])(yd, idx) + yx[:, :, None, :]
            mean = jnp.mean(edge.reshape(B, N, K, G, C // G), axis=(1, 2, 4))
            m2 = jnp.mean((edge * edge).reshape(B, N, K, G, C // G),
                          axis=(1, 2, 4))
            var = m2 - mean * mean
            inv = jax.lax.rsqrt(var + 1e-5)
            aa = scale[None, :] * jnp.repeat(inv, C // G, 1)
            bb = bias[None, :] - jnp.repeat(mean, C // G, 1) * aa
            e = aa[:, None, None, :] * edge + bb[:, None, None, :]
            return jnp.max(jax.nn.leaky_relu(e, 0.2), axis=2)

        @jax.jit
        def f(a):
            out = one(a)
            for _ in range(k - 1):
                out = one(a + 1e-12 * out.ravel()[0])
            return out
        return f

    slope("reduce only", mk("reduce"), x)
    slope("reduce+stats", mk("stats"), x)
    slope("full fused", mk("full"), x)
    slope("old materializing", mk_old, x)


if __name__ == "__main__":
    main()
