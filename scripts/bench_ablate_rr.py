"""Round-robin in-process ablation comparison: all ablated pipeline
variants measured interleaved in ONE process, so transient tunnel
congestion hits every variant equally and the full-pipeline baseline
normalizes the rest. Programs are expected to be compile-cached."""
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
ROUNDS = 6


def main():
    from bench import load_trained_params
    from parsenet_tpu.data.abc import normalize_points
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.eval.pipeline import (predict_segmentation,
                                            reconstruct_shape,
                                            SegmentationPrediction)
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.train.train_e2e import build_spline_fit

    host = np.random.RandomState(7)
    pts, labels, normals, prim = make_shape_batch(host, 2 * B, N)
    for i in range(2 * B):
        pts[i], normals[i], _, _ = normalize_points(pts[i], normals[i])
    P = jnp.asarray(pts[B:2 * B].astype(np.float32))
    NR = jnp.asarray(normals[B:2 * B].astype(np.float32))
    L, PR = jnp.asarray(labels[B:2 * B]), jnp.asarray(prim[B:2 * B])
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80)
    params, _ = load_trained_params(model)
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))
    spline_fit = build_spline_fit(grid=20, log_dir="logs")

    def make(ablate):
        sfit = None if "splines" in ablate else spline_fit
        skip = tuple(s for s in ablate if s in ("coverage", "residual"))

        def shape_pipeline(p, n, lab, pr, key):
            from parsenet_tpu.ops.mean_shift import guard_mean_shift
            from parsenet_tpu.ops.segmentation import (siou_matched_segments,
                                                       to_one_hot)
            x = jnp.concatenate([p, n], axis=-1)
            k1, k2 = jax.random.split(key)
            if "ms" in ablate:
                emb, prim_logp = apply_fn(x[None])
                pred = SegmentationPrediction(
                    lab, jnp.argmax(prim_logp[0], -1), emb[0],
                    jnp.float32(1.0), jnp.float32(1.0), jnp.int32(0))
            elif "lapid" in ablate or "lapnofill" in ablate:
                # full predict but the Hungarian solve replaced by the
                # identity assignment: isolates the auction while_loop cost
                # from the rest of the SIOU computation
                from parsenet_tpu.ops.segmentation import (
                    primitive_type_per_segment, remap_primitive_labels,
                    K_MAX)
                emb, prim_logp = apply_fn(x[None])
                emb = emb[0]
                pred_prim = jnp.argmax(prim_logp[0], -1)
                embn = emb / (jnp.linalg.norm(emb, -1, keepdims=True) + 1e-12)
                ms = guard_mean_shift(
                    embn, 0.015, key=k1, num_samples=5000, iterations=50,
                    use_pallas=True, pallas_bf16=True, differentiable=False)
                from parsenet_tpu.ops.segmentation import relaxed_iou
                gt_prim = remap_primitive_labels(pr)
                pp = remap_primitive_labels(pred_prim)
                gt_oh = to_one_hot(lab)
                pred_oh = to_one_hot(ms.labels)
                cost = 1.0 - relaxed_iou(pred_oh, gt_oh)
                if "lapnofill" in ablate:
                    # benefit prep + pallas auction kernel, but identity
                    # instead of the completion fill: isolates the fill
                    from parsenet_tpu.ops.hungarian import (_TIE, _BETA,
                                                            _EPS0,
                                                            _ESC_EVERY, _ESC)
                    from parsenet_tpu.ops.pallas_kernels import (
                        auction_assign_pallas)
                    c32 = cost.astype(jnp.float32)
                    span = jnp.max(c32, 1) - jnp.min(c32, 1)
                    uni = span <= 1e-6
                    tie = _TIE * jnp.arange(K_MAX, dtype=jnp.float32)[None]
                    park = _BETA * uni[:, None] * jnp.eye(K_MAX)
                    ben = -(c32 + tie) + park
                    asg = auction_assign_pallas(ben, _EPS0, _ESC_EVERY,
                                                _ESC, 3000)
                    col_of_row = jnp.arange(K_MAX) + jnp.int32(
                        jnp.sum(asg) * 0)
                else:
                    col_of_row = jnp.arange(K_MAX) + jnp.int32(
                        jnp.sum(cost) * 0)  # identity "assignment"
                pred_counts = jnp.sum(pred_oh, axis=0)
                gt_counts = jnp.sum(gt_oh, axis=0)
                inter = jnp.dot(pred_oh.T, gt_oh)
                r_ = jnp.arange(K_MAX)
                pair_inter = inter[r_, col_of_row]
                pair_union = pred_counts + gt_counts[col_of_row] - pair_inter
                iou = pair_inter / (pair_union + 1e-8)
                v = (pred_counts > 0) & (gt_counts[col_of_row] >= 100)
                si = jnp.sum(iou * v) / (jnp.sum(v) + 1e-8)
                prim_oh = jax.nn.one_hot(pp, 10, dtype=jnp.float32)
                spt = primitive_type_per_segment(prim_oh, pred_oh)
                gt_prim_oh = jax.nn.one_hot(gt_prim, 10, dtype=jnp.float32)
                gst = jnp.argmax(jnp.dot(gt_oh.T, gt_prim_oh), axis=1)
                pi = jnp.sum((spt == gst[col_of_row]) * v) / (jnp.sum(v) + 1e-8)
                pred = SegmentationPrediction(ms.labels, pred_prim, emb, si,
                                              pi, ms.num_clusters)
            elif ("nosiou" in ablate or "ms10" in ablate
                  or "noattempt" in ablate or "bf16" in ablate):
                emb, prim_logp = apply_fn(x[None])
                emb = emb[0]
                pred_prim = jnp.argmax(prim_logp[0], -1)
                embn = emb / (jnp.linalg.norm(emb, -1, keepdims=True) + 1e-12)
                iters = 10 if "ms10" in ablate else 50
                ms = guard_mean_shift(
                    embn, 0.015, key=k1, num_samples=5000, iterations=iters,
                    use_pallas=True, pallas_bf16=True, differentiable=False,
                    max_doublings=0 if "noattempt" in ablate else 8)
                if "nosiou" in ablate:
                    si = pi = jnp.float32(0.0)
                else:
                    si, pi = siou_matched_segments(lab, ms.labels, pred_prim,
                                                   pr, to_one_hot(ms.labels))
                pred = SegmentationPrediction(ms.labels, pred_prim, emb, si,
                                              pi, ms.num_clusters)
            else:
                pred = predict_segmentation(apply_fn, x, lab, pr, k1)
            if "recon" in ablate:
                return pred, jnp.zeros(())
            rec = reconstruct_shape(
                p, n, pred.labels, pred.pred_prim, k2, spline_fit=sfit,
                eval_preprocess="preprocess" not in ablate,
                profile_skip=skip)
            return pred, rec

        @jax.jit
        def f(p, n, lab, pr, kk):
            pred, rec = jax.vmap(shape_pipeline)(p, n, lab, pr, kk)
            res = rec.residual if hasattr(rec, "residual") else rec
            extra = (jnp.sum(rec.p_cov) + jnp.sum(rec.sk_2)
                     if hasattr(rec, "p_cov") else jnp.float32(0))
            return jnp.stack([jnp.sum(res), jnp.sum(pred.seg_iou), extra,
                              extra * 0])
        return f

    variants = {
        "full": (),
        "identity-lap (recon on)": ("lapid",),
        "kernel-no-fill (recon on)": ("lapnofill",),
    }
    fns = {name: make(a) for name, a in variants.items()}
    # compile/warm all
    for name, f in fns.items():
        out = f(P, NR, L, PR, keys)
        np.asarray(out)
        print(f"warm {name}")

    acc = {name: [] for name in fns}
    for r in range(ROUNDS):
        for name, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(P, NR, L, PR, keys))
            acc[name].append((time.perf_counter() - t0) * 1000)
    base = np.median(acc["full"])
    print(f"\nfull pipeline: {base / B:.1f} ms/shape (median of {ROUNDS})")
    for name in fns:
        m = np.median(acc[name])
        print(f"{name}: {m / B:6.1f} ms/shape   delta vs full: "
              f"{(base - m) / B:6.1f}")


if __name__ == "__main__":
    main()
