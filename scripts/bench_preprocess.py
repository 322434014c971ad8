"""Micro-bench of the eval segment preprocessing internals on the chip."""
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


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.1f} ms")
    return dt


def main():
    from parsenet_tpu.ops.preprocess import (eval_segment_points,
                                             nn_centroid_upsample,
                                             pack_segment,
                                             statistical_inliers_packed)

    rng = np.random.RandomState(0)
    N = 10000
    pts = rng.randn(N, 3).astype(np.float32)
    labels = rng.randint(0, 24, N).astype(np.int32)
    P = jnp.asarray(pts)
    L = jnp.asarray(labels)

    @jax.jit
    def full12(key):
        keys = jax.random.split(key, 12)
        segs = jnp.arange(12)
        return jax.vmap(lambda s, kk: eval_segment_points(
            P, L == s, jnp.int32(1800), kk))(segs, keys)

    @jax.jit
    def pack12(key):
        keys = jax.random.split(key, 12)
        segs = jnp.arange(12)
        return jax.vmap(lambda s, kk: pack_segment(P, L == s, kk))(segs, keys)

    @jax.jit
    def outlier12(key):
        keys = jax.random.split(key, 12)
        segs = jnp.arange(12)
        def one(s, kk):
            p, m = pack_segment(P, L == s, kk)
            return statistical_inliers_packed(p, m)
        return jax.vmap(one)(segs, keys)

    @jax.jit
    def upsample12(key):
        keys = jax.random.split(key, 12)
        segs = jnp.arange(12)
        def one(s, kk):
            p, m = pack_segment(P, L == s, kk)
            return nn_centroid_upsample(p, m, jnp.int32(1800))
        return jax.vmap(one)(segs, keys)

    k = jax.random.PRNGKey(0)
    timeit("pack only (12 slots)", pack12, k)
    timeit("pack + outlier (12 slots)", outlier12, k)
    timeit("pack + upsample (12 slots)", upsample12, k)
    timeit("full eval_segment_points (12 slots)", full12, k)


if __name__ == "__main__":
    main()
