"""A/B the mean-shift perf knobs on the chip: partial-selection bandwidth,
early-exit tol, bf16 dots. Compares labels + timing against the exact-sort
f32 fixed-count path on trained-model embeddings."""
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


def main():
    from bench import load_trained_params
    from parsenet_tpu.data.abc import normalize_points
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.ops.mean_shift import guard_mean_shift

    host = np.random.RandomState(7)
    pts, labels, normals, prim = make_shape_batch(host, 3 * B, N)
    for i in range(3 * B):
        pts[i], normals[i], _, _ = normalize_points(pts[i], normals[i])
    xs = jnp.asarray(np.concatenate([pts, normals], -1).astype(np.float32))

    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80)
    params, trained = load_trained_params(model)
    print("trained:", trained)
    fwd = jax.jit(lambda x: model.apply({"params": params}, x))
    embs = []
    for b in range(3):
        e, _ = fwd(xs[b * B:(b + 1) * B])
        embs.append(e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12))
    keys = jax.random.split(jax.random.PRNGKey(0), 3 * B).reshape(3, B, 2)

    def make(variant):
        kw = dict(num_samples=5000, iterations=50, use_pallas=True,
                  attempt_iterations=10)
        q = 0.015
        if variant == "sortpath":
            q = jnp.float32(0.015)  # traced -> exact-sort bandwidth
        if "tol" in variant:
            kw["pallas_tol"] = 1e-6
        if "bf16" in variant:
            kw["pallas_bf16"] = True

        @jax.jit
        def f(e, kk):
            return jax.vmap(lambda ee, k1: guard_mean_shift(
                ee, q, key=k1, **kw).labels)(e, kk)
        return f

    results = {}
    for variant in ["sortpath", "base", "tol", "bf16", "bf16_tol"]:
        f = make(variant)
        out = [np.asarray(f(embs[b], keys[b])) for b in range(3)]  # compile+warm
        t0 = time.perf_counter()
        for rep in range(4):
            out = [np.asarray(f(embs[b], keys[b])) for b in range(3)]
        dt = (time.perf_counter() - t0) / 4 / (3 * B) * 1000
        results[variant] = (np.concatenate(out), dt)
        print(f"{variant}: {dt:.1f} ms/shape")

    ref = results["sortpath"][0]
    for variant, (lab, dt) in results.items():
        agree = float((lab == ref).mean())
        # label ids are order-sensitive; also compare partition agreement
        same_k = all((len(np.unique(lab[i])) == len(np.unique(ref[i])))
                     for i in range(3 * B))
        print(f"{variant}: label agree {agree:.4f} same_cluster_count {same_k}")


if __name__ == "__main__":
    main()
