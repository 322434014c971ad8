"""Fresh stage breakdown of the batch-4 inference pipeline on the chip.

Each stage is its own jit, so numbers are upper bounds (+~30 ms relay per
call, no cross-stage fusion) — use the RELATIVE sizes to pick targets.
"""
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

B = 4
N = 10000


def timeit(name, fn, *args, reps=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.1f} ms/batch ({dt / B:.1f} ms/shape)")
    return out


def main():
    from bench import load_trained_params
    from parsenet_tpu.data.abc import normalize_points
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.eval.pipeline import (predict_segmentation,
                                            reconstruct_shape)
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.ops.mean_shift import guard_mean_shift
    from parsenet_tpu.ops.segmentation import siou_matched_segments, to_one_hot
    from parsenet_tpu.train.train_e2e import build_spline_fit

    host = np.random.RandomState(7)
    pts, labels, normals, prim = make_shape_batch(host, B, N)
    for i in range(B):
        pts[i], normals[i], _, _ = normalize_points(pts[i], normals[i])
    xs = jnp.asarray(np.concatenate([pts, normals], -1).astype(np.float32))
    P, NR = jnp.asarray(pts), jnp.asarray(normals)
    L, PR = jnp.asarray(labels), jnp.asarray(prim)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80)
    params, _ = load_trained_params(model)
    fwd = jax.jit(lambda x: model.apply({"params": params}, x))

    model16 = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5,
                                  k=80, dtype=jnp.bfloat16)
    fwd16 = jax.jit(lambda x: model16.apply({"params": params}, x))

    emb, _ = timeit("forward f32 [4,10k]", fwd, xs)
    timeit("forward bf16 [4,10k]", fwd16, xs)

    embn = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)

    @jax.jit
    def ms_f32(e, kk):
        return jax.vmap(lambda ee, k1: guard_mean_shift(
            ee, 0.015, key=k1, num_samples=5000, iterations=50,
            use_pallas=True, attempt_iterations=10).labels)(e, kk)

    @jax.jit
    def ms_b16(e, kk):
        return jax.vmap(lambda ee, k1: guard_mean_shift(
            ee, 0.015, key=k1, num_samples=5000, iterations=50,
            use_pallas=True, attempt_iterations=10,
            pallas_bf16=True).labels)(e, kk)

    lab_f32 = timeit("mean-shift guard f32-pallas", ms_f32, embn, keys)
    lab_b16 = timeit("mean-shift guard bf16-pallas", ms_b16, embn, keys)
    agree = float(jnp.mean((lab_f32 == lab_b16).astype(jnp.float32)))
    print(f"  bf16 label agreement: {agree:.4f}")

    @jax.jit
    def siou(lab):
        def one(gl, pl, pp, gp):
            return siou_matched_segments(gl, pl, pp, gp, to_one_hot(pl))
        return jax.vmap(one)(L, lab, PR, PR)

    timeit("SIOU (matched segments)", siou, lab_f32)

    spline_fit = build_spline_fit(grid=20, log_dir="logs")

    @jax.jit
    def recon(lab, kk):
        return jax.vmap(lambda p, n, l, pr, k1: reconstruct_shape(
            p, n, l, pr, k1, spline_fit=spline_fit).residual)(
                P, NR, lab, PR, kk)

    @jax.jit
    def recon_nosp(lab, kk):
        return jax.vmap(lambda p, n, l, pr, k1: reconstruct_shape(
            p, n, l, pr, k1, spline_fit=None).residual)(P, NR, lab, PR, kk)

    timeit("reconstruct (splines+preprocess)", recon, lab_f32, keys)
    timeit("reconstruct (no splines)", recon_nosp, lab_f32, keys)


if __name__ == "__main__":
    main()
