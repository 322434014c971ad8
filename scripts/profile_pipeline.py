"""Stage-level timing of the inference pipeline on the real chip.

Methodology notes (this environment's tunneled runtime):
- unique inputs per repetition (identical-input repeats get mis-timed),
- host-fetch sync per call (block_until_ready under-reports),
- ~30 ms fixed per-program latency is included in every number.

Usage: python scripts/profile_pipeline.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(name, fn, inputs, reps=5):
    out = fn(inputs[0])
    jax.tree_util.tree_map(
        lambda a: float(jnp.sum(jnp.asarray(a, jnp.float32))), out)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        out = fn(inputs[i])
        jax.tree_util.tree_map(
            lambda a: float(jnp.sum(jnp.asarray(a, jnp.float32))), out)
    print(f"{name}: {1e3 * (time.perf_counter() - t0) / reps:.1f} ms")
    return out


def main():
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.eval.pipeline import (predict_segmentation,
                                            reconstruct_shape)
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.ops.mean_shift import guard_mean_shift
    from parsenet_tpu.ops.segmentation import siou_matched_segments, to_one_hot
    from parsenet_tpu.train.train_e2e import build_spline_fit

    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10000, 6)))
    apply_fn = jax.jit(lambda x: model.apply(variables, x))
    spline_fit = build_spline_fit(grid=20)
    host = np.random.RandomState(0)
    pts, labels, normals, prim = make_shape_batch(host, 6, 10000)
    xs = np.concatenate([pts, normals], -1).astype(np.float32)

    embs = bench("forward (DGCNN k=80)",
                 lambda x: apply_fn(jnp.asarray(x)[None]), xs)
    emb_list = []
    for i in range(6):
        e, _ = apply_fn(jnp.asarray(xs[i])[None])
        e = e[0]
        emb_list.append(e / (jnp.linalg.norm(e, -1, keepdims=True) + 1e-12))
    ms_list = []
    def run_ms(e):
        return guard_mean_shift(e, 0.015, key=jax.random.PRNGKey(0),
                                iterations=50, use_pallas=True)
    out = bench("mean-shift guard (pallas, 50 it)", run_ms, emb_list)
    for e in emb_list:
        ms_list.append(run_ms(e))
    bench("SIOU (relaxed IoU + auction + votes)",
          lambda args: siou_matched_segments(
              args[0], args[1].labels, args[2], args[0],
              to_one_hot(args[1].labels)),
          [(jnp.asarray(labels[i]), ms_list[i], jnp.asarray(prim[i]))
           for i in range(6)])
    bench("reconstruct (fits + surfaces + coverage, 12 spline slots)",
          lambda args: reconstruct_shape(
              jnp.asarray(pts[args]), jnp.asarray(normals[args]),
              ms_list[args].labels,
              jnp.asarray(prim[args]), jax.random.PRNGKey(args),
              spline_fit=spline_fit),
          list(range(6)))
    bench("reconstruct (legacy sampling, no eval preprocess)",
          lambda args: reconstruct_shape(
              jnp.asarray(pts[args]), jnp.asarray(normals[args]),
              ms_list[args].labels,
              jnp.asarray(prim[args]), jax.random.PRNGKey(args),
              spline_fit=spline_fit, eval_preprocess=False),
          list(range(6)))

    from parsenet_tpu.ops.preprocess import eval_segment_points

    @jax.jit
    def preprocess_12(p, lab, key):
        keys = jax.random.split(key, 12)
        segs = jnp.arange(12)
        return jax.vmap(lambda s, kk: eval_segment_points(
            p, lab == s, jnp.int32(1800), kk))(segs, keys)

    bench("eval preprocess only (12 slots: outliers + upsample)",
          lambda i: preprocess_12(jnp.asarray(pts[i]), ms_list[i].labels,
                                  jax.random.PRNGKey(i)),
          list(range(6)))


if __name__ == "__main__":
    main()
