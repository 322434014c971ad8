"""Slope-based REAL costs of the fused-pipeline stages: chain each stage
twice inside one jit (with CSE-blocking data dependencies) and difference
against the single-stage program, cancelling the axon relay/transfer
overhead that poisons single-call timings."""
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


def timed(fn, *args, reps=6):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    from bench import load_trained_params
    from parsenet_tpu.data.abc import normalize_points
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.eval.pipeline import (predict_segmentation,
                                            reconstruct_shape)
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
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
    params, trained = load_trained_params(model)
    print("trained:", trained)
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))
    spline_fit = build_spline_fit(grid=20, log_dir="logs")

    def fwd_once(x):
        e, lp = model.apply({"params": params}, x)
        return e, lp

    def mk_fwd(k):
        @jax.jit
        def f(x):
            e, lp = fwd_once(x)
            for i in range(k - 1):
                # CSE blocker: input depends on previous output
                e, lp = fwd_once(x + 1e-12 * e[..., :1] * 0 + 1e-12 * jnp.sum(e))
            return e, lp
        return f

    def mk_pred(k):
        @jax.jit
        def f(x, kk):
            out = jax.vmap(lambda xb, gl, gp, k1: predict_segmentation(
                apply_fn, xb, gl, gp, k1))(x, L, PR, kk)
            for i in range(k - 1):
                x2 = x + 1e-12 * jnp.sum(out.seg_iou)
                out = jax.vmap(lambda xb, gl, gp, k1: predict_segmentation(
                    apply_fn, xb, gl, gp, k1))(x2, L, PR, kk)
            return out.seg_iou
        return f

    def mk_recon(k):
        labs = jax.vmap(lambda xb, gl, gp, k1: predict_segmentation(
            apply_fn, xb, gl, gp, k1).labels)(xs, L, PR, keys)
        labs = jax.block_until_ready(jax.jit(lambda a: a)(labs))

        @jax.jit
        def f(p, kk):
            out = jax.vmap(lambda pp, nn, ll, pr, k1: reconstruct_shape(
                pp, nn, ll, pr, k1, spline_fit=spline_fit).residual)(
                    p, NR, labs, PR, kk)
            for i in range(k - 1):
                p2 = p + 1e-12 * jnp.sum(out)
                out = jax.vmap(lambda pp, nn, ll, pr, k1: reconstruct_shape(
                    pp, nn, ll, pr, k1, spline_fit=spline_fit).residual)(
                        p2, NR, labs, PR, kk)
            return out
        return f, labs

    def mk_pipe(k):
        @jax.jit
        def f(x, p, kk):
            def one(xb, pp, nn, gl, gp, k1):
                k1a, k1b = jax.random.split(k1)
                pred = predict_segmentation(apply_fn, xb, gl, gp, k1a)
                rec = reconstruct_shape(pp, nn, pred.labels, pred.pred_prim,
                                        k1b, spline_fit=spline_fit)
                return pred.seg_iou, rec.residual
            out = jax.vmap(one)(x, p, NR, L, PR, kk)
            for i in range(k - 1):
                x2 = x + 1e-12 * jnp.sum(out[1])
                out = jax.vmap(one)(x2, p, NR, L, PR, kk)
            return out
        return f

    for name, mk, args in [
        ("forward", mk_fwd, (xs,)),
        ("predict_segmentation (fwd+ms+siou)", mk_pred, (xs, keys)),
    ]:
        t1 = timed(mk(1), *args)
        t2 = timed(mk(2), *args)
        print(f"{name}: 1x {t1:.1f} 2x {t2:.1f} -> {t2 - t1:.1f} ms/batch "
              f"({(t2 - t1) / B:.1f} ms/shape)")

    f1, labs = mk_recon(1)
    f2, _ = mk_recon(2)
    t1, t2 = timed(f1, P, keys), timed(f2, P, keys)
    print(f"reconstruct: 1x {t1:.1f} 2x {t2:.1f} -> {t2 - t1:.1f} ms/batch "
          f"({(t2 - t1) / B:.1f} ms/shape)")

    t1 = timed(mk_pipe(1), xs, P, keys)
    t2 = timed(mk_pipe(2), xs, P, keys)
    print(f"full pipeline: 1x {t1:.1f} 2x {t2:.1f} -> {t2 - t1:.1f} ms/batch "
          f"({(t2 - t1) / B:.1f} ms/shape)")


if __name__ == "__main__":
    main()
