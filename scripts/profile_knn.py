"""Where does the [10k,10k] kNN time go? dist matmul vs selection op,
chunked vs unchunked, f32 vs bf16, approx vs exact."""
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


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        out = jax.tree_util.tree_map(lambda a: np.asarray(a[:1]), out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.1f} ms/batch ({dt / B:.2f} ms/shape)")


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    def dist_only(xb):
        def one(xs):
            xx = jnp.sum(xs * xs, -1)
            neg = 2.0 * jnp.dot(xs, xs.T, preferred_element_type=jnp.float32)
            return jnp.sum(neg - xx[None, :], axis=-1)  # reduce to avoid 400MB out
        return jax.vmap(one)(xb)

    def dist_bf16(xb):
        def one(xs):
            s = xs.astype(jnp.bfloat16)
            neg = 2.0 * jnp.dot(s, s.T, preferred_element_type=jnp.float32)
            return jnp.sum(neg, axis=-1)
        return jax.vmap(one)(xb)

    def knn_unchunked_approx(xb):
        def one(xs):
            xx = jnp.sum(xs * xs, -1)
            neg = 2.0 * jnp.dot(xs, xs.T, preferred_element_type=jnp.float32) \
                - xx[None, :]
            return lax.approx_max_k(neg, K, recall_target=0.95)[1]
        return jax.vmap(one)(xb)

    def knn_unchunked_exact(xb):
        def one(xs):
            xx = jnp.sum(xs * xs, -1)
            neg = 2.0 * jnp.dot(xs, xs.T, preferred_element_type=jnp.float32) \
                - xx[None, :]
            return lax.top_k(neg, K)[1]
        return jax.vmap(one)(xb)

    def knn_chunked(xb, chunk):
        def one(xs):
            xx = jnp.sum(xs * xs, -1)

            def body(q):
                neg = 2.0 * jnp.dot(q, xs.T,
                                    preferred_element_type=jnp.float32)
                neg = neg - jnp.sum(q * q, -1, keepdims=True) - xx[None, :]
                return lax.approx_max_k(neg, K, recall_target=0.95)[1]
            qs = xs.reshape(N // chunk, chunk, C)
            return lax.map(body, qs).reshape(N, K)
        return jax.vmap(one)(xb)

    from parsenet_tpu.ops import knn as knn_ops
    timeit("dist matmul only f32", jax.jit(dist_only), x)
    timeit("dist matmul only bf16", jax.jit(dist_bf16), x)
    timeit("unchunked dist+approx_max_k", jax.jit(knn_unchunked_approx), x)
    timeit("unchunked dist+exact top_k", jax.jit(knn_unchunked_exact), x)
    timeit("chunked 1000 (current)", jax.jit(lambda a: knn_chunked(a, 1000)), x)
    timeit("chunked 2500", jax.jit(lambda a: knn_chunked(a, 2500)), x)
    timeit("ops.knn (current impl)",
           jax.jit(lambda a: knn_ops.knn(a, k1=K, k2=K)), x)

    # EdgeConv-scale gather+reduce cost: [B,N,k,C] gather -> 4 reductions
    idx = knn_ops.knn(x, k1=K, k2=K)

    def gather_reduce(xb, ib):
        g = jax.vmap(lambda a, i: a[i])(xb, ib)
        return (jnp.sum(g, 2), jnp.sum(g * g, 2), jnp.max(g, 2),
                jnp.min(g, 2))
    timeit("gather + 4 reductions [B,N,80,64]", jax.jit(gather_reduce), x, idx)

    # full forward, fused EdgeConv
    from bench import load_trained_params
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80)
    params, _ = load_trained_params(model)
    x6 = jnp.asarray(rng.randn(B, N, 6).astype(np.float32))
    fwd = jax.jit(lambda a: model.apply({"params": params}, a))
    timeit("full forward (fused EdgeConv)", fwd, x6)


if __name__ == "__main__":
    main()
