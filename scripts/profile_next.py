"""Slopes after the unchunked-kNN change: forward, guard_mean_shift, SIOU."""
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

B, N = 4, 10000


def timed(fn, *args, reps=8):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], out)
    return (time.perf_counter() - t0) / reps * 1000


def slope(name, mk, *args):
    t1, t3 = timed(mk(1), *args), timed(mk(3), *args)
    per = (t3 - t1) / 2
    print(f"{name}: 1x {t1:.0f} 3x {t3:.0f} -> {per:.1f} ms/batch "
          f"({per / B:.2f} ms/shape)")


def main():
    from bench import load_trained_params
    from parsenet_tpu.data.abc import normalize_points
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.ops.mean_shift import guard_mean_shift
    from parsenet_tpu.ops.segmentation import siou_matched_segments, to_one_hot

    host = np.random.RandomState(7)
    pts, labels, normals, prim = make_shape_batch(host, B, N)
    for i in range(B):
        pts[i], normals[i], _, _ = normalize_points(pts[i], normals[i])
    xs = jnp.asarray(np.concatenate([pts, normals], -1).astype(np.float32))
    L, PR = jnp.asarray(labels), jnp.asarray(prim)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80)
    params, _ = load_trained_params(model)

    def mk_fwd(k):
        @jax.jit
        def f(x):
            e, lp = model.apply({"params": params}, x)
            for _ in range(k - 1):
                e, lp = model.apply({"params": params},
                                    x + 1e-12 * jnp.sum(e))
            return e
        return f

    # realistic embedding for guard/siou
    e0 = jax.jit(lambda x: model.apply({"params": params}, x)[0])(xs)
    e0 = e0 / (jnp.linalg.norm(e0, axis=-1, keepdims=True) + 1e-12)
    e0 = jax.block_until_ready(e0)
    lab_pred = jax.jit(jax.vmap(lambda ee, kk: guard_mean_shift(
        ee, 0.015, key=kk, num_samples=5000, iterations=50, use_pallas=True,
        attempt_iterations=10).labels))(e0, keys)
    lab_pred = jax.block_until_ready(lab_pred)

    def mk_guard(k):
        @jax.jit
        def f(e, kk):
            out = jax.vmap(lambda ee, k1: guard_mean_shift(
                ee, 0.015, key=k1, num_samples=5000, iterations=50,
                use_pallas=True, attempt_iterations=10).labels)(e, kk)
            for _ in range(k - 1):
                out = jax.vmap(lambda ee, k1: guard_mean_shift(
                    ee, 0.015, key=k1, num_samples=5000, iterations=50,
                    use_pallas=True, attempt_iterations=10).labels)(
                        e + 1e-12 * out[0, 0], kk)
            return out
        return f

    def mk_siou(k):
        @jax.jit
        def f(lp, gl, pr):
            def one(l_):
                return siou_matched_segments(gl[0], l_, pr[0], pr[0],
                                             to_one_hot(l_))[0]
            out = jax.vmap(one)(lp)
            for _ in range(k - 1):
                out = jax.vmap(one)(lp + (out[0] * 0).astype(lp.dtype))
            return out
        return f

    slope("forward (unchunked kNN)", mk_fwd, xs)
    slope("guard_mean_shift 50it", mk_guard, e0, keys)
    slope("siou_matched_segments", mk_siou, lab_pred, L, PR)


if __name__ == "__main__":
    main()
