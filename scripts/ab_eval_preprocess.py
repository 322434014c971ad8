"""A/B the reference eval-mode spline preprocessing inside reconstruct_shape.

Runs the full inference pipeline on the bench's held-out synthetic stream
twice — eval_preprocess=True (reference outlier-removal + NN-centroid
upsample) vs False (round-1 with-replacement sampling) — and prints
residual / seg_iou / sk metrics and per-shape time for each.

VERDICT round-1 task 4 asks for exactly this A/B.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NUM_POINTS = 10000
BATCH = 4
ITERS = 6

def main():
    from bench import load_trained_params
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.eval.pipeline import (predict_segmentation,
                                            reconstruct_shape)
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.train.train_e2e import build_spline_fit

    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80)
    params, trained = load_trained_params(model)
    print("trained:", trained, file=sys.stderr)
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))
    spline_fit = build_spline_fit(grid=20, log_dir="logs")

    host = np.random.RandomState(7)
    n_shapes = (1 + ITERS) * BATCH
    pts, labels, normals, prim = make_shape_batch(host, n_shapes, NUM_POINTS)
    from parsenet_tpu.data.abc import normalize_points
    for i in range(n_shapes):
        pts[i], normals[i], _, _ = normalize_points(pts[i], normals[i])
    xs = np.concatenate([pts, normals], -1).astype(np.float32)

    def pipeline(ep):
        def shape_pipeline(x, p, n, lab, pr, key):
            k1, k2 = jax.random.split(key)
            pred = predict_segmentation(apply_fn, x, lab, pr, k1)
            rec = reconstruct_shape(p, n, pred.labels, pred.pred_prim, k2,
                                    spline_fit=spline_fit, eval_preprocess=ep)
            return pred, rec
        return jax.jit(jax.vmap(shape_pipeline, in_axes=(0, 0, 0, 0, 0, 0)))

    key = jax.random.PRNGKey(1)
    for ep in (True, False):
        f = pipeline(ep)
        key2 = key
        # warmup
        key2, sub = jax.random.split(key2)
        out = f(jnp.asarray(xs[:BATCH]), jnp.asarray(pts[:BATCH]),
                jnp.asarray(normals[:BATCH]), jnp.asarray(labels[:BATCH]),
                jnp.asarray(prim[:BATCH]), jax.random.split(sub, BATCH))
        jax.block_until_ready(out)
        agg = {"residual": 0.0, "seg_iou": 0.0, "sk_1": 0.0, "sk_2": 0.0,
               "p_cov": 0.0}
        t0 = time.perf_counter()
        for b in range(1, 1 + ITERS):
            s = slice(b * BATCH, (b + 1) * BATCH)
            key2, sub = jax.random.split(key2)
            pred, rec = f(jnp.asarray(xs[s]), jnp.asarray(pts[s]),
                          jnp.asarray(normals[s]), jnp.asarray(labels[s]),
                          jnp.asarray(prim[s]), jax.random.split(sub, BATCH))
            agg["residual"] += float(jnp.sum(rec.residual))
            agg["seg_iou"] += float(jnp.sum(pred.seg_iou))
            agg["sk_1"] += float(jnp.sum(rec.sk_1))
            agg["sk_2"] += float(jnp.sum(rec.sk_2))
            agg["p_cov"] += float(jnp.sum(rec.p_cov))
        dt = time.perf_counter() - t0
        n = ITERS * BATCH
        print(f"eval_preprocess={ep}: "
              + " ".join(f"{k}={v / n:.4f}" for k, v in agg.items())
              + f" per_shape_ms={1000 * dt / n:.1f}")


if __name__ == "__main__":
    main()
