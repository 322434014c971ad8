"""Component-level timing of guard_mean_shift on the chip: where do the
~69 ms/shape actually go?"""
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

B, N, D = 4, 10000, 128


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.1f} ms/batch ({dt / B:.2f} ms/shape)")


def main():
    from parsenet_tpu.ops.mean_shift import (_subset_sqdist,
                                             _initial_bandwidth, nms,
                                             mean_shift_iterations)
    from parsenet_tpu.ops.pallas_kernels import mean_shift_iterations_pallas

    rng = np.random.RandomState(0)
    # semi-clustered embeddings (realistic post-training structure)
    centers = rng.randn(12, D).astype(np.float32)
    lab = rng.randint(0, 12, (B, N))
    x = centers[lab] + 0.15 * rng.randn(B, N, D).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    X = jnp.asarray(x)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    bw = jnp.float32(0.12)

    @jax.jit
    def f_subset(e, kk):
        return jax.vmap(lambda ee, k1: _initial_bandwidth(
            _subset_sqdist(ee, k1, 5000), 0.015))(e, kk)

    @jax.jit
    def f_subset_sort(e, kk):
        return jax.vmap(lambda ee, k1: jnp.sum(jnp.sort(
            _subset_sqdist(ee, k1, 5000), axis=-1)[:, 75]))(e, kk)

    def make_iters(it, bf16):
        @jax.jit
        def f(e):
            return jax.vmap(lambda ee: mean_shift_iterations_pallas(
                ee, bw, it, bf16_dots=bf16))(e)
        return f

    @jax.jit
    def f_nms(e):
        return jax.vmap(lambda ee: nms(ee, ee, bw)[1])(e)

    @jax.jit
    def f_xla_iters(e):
        return jax.vmap(lambda ee: mean_shift_iterations(ee, bw, 50))(e)

    timeit("subset+approx bandwidth", f_subset, X, keys)
    timeit("subset+full sort", f_subset_sort, X, keys)
    timeit("pallas 10 iters f32", make_iters(10, False), X)
    timeit("pallas 50 iters f32", make_iters(50, False), X)
    timeit("pallas 50 iters bf16", make_iters(50, True), X)
    timeit("XLA 50 iters f32", f_xla_iters, X)
    timeit("nms", f_nms, X)


if __name__ == "__main__":
    main()
