"""Slope decomposition of reconstruct_shape's ~47 ms/shape."""
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
    from parsenet_tpu.eval.pipeline import (predict_segmentation, SURF_GRID,
                                            CLOSED_PTS, OPEN_PTS,
                                            EVAL_SPLINE_SLOTS)
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.ops.primitive_fits import fit_all_primitives_shared_points
    from parsenet_tpu.ops.primitive_dist import residual_select, geom_type_from_label
    from parsenet_tpu.ops.segmentation import (K_MAX, to_one_hot,
                                               primitive_type_per_segment,
                                               remap_primitive_labels)
    from parsenet_tpu.ops.preprocess import eval_segment_points
    from parsenet_tpu.ops.chamfer import min_sqdist
    from parsenet_tpu.core.guards import EPS
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
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))
    spline_fit = build_spline_fit(grid=20, log_dir="logs")

    labs = jax.jit(jax.vmap(lambda xb, gl, gp, k1: predict_segmentation(
        apply_fn, xb, gl, gp, k1).labels))(xs, L, PR, keys)
    labs = jax.block_until_ready(labs)

    def mk_fits(k):
        @jax.jit
        def f(p):
            acc = 0.0
            for _ in range(k):
                oh = to_one_hot(labs[0] + jnp.int32(acc * 0))
                pr = fit_all_primitives_shared_points(p[0] + acc * 0, NR[0],
                                                      oh.T + EPS)
                acc = acc + jnp.sum(pr.plane.normal) + jnp.sum(pr.cone.theta)
            return acc
        return f

    from parsenet_tpu.ops.sampling import (sample_cone, sample_cylinder,
                                           sample_plane, sample_sphere)

    def mk_sample(k):
        oh0 = to_one_hot(labs[0])
        pr0 = fit_all_primitives_shared_points(P[0], NR[0], oh0.T + EPS)
        prim_oh = jax.nn.one_hot(remap_primitive_labels(PR[0]), 10, dtype=jnp.float32)
        seg10 = primitive_type_per_segment(prim_oh, oh0)
        gt = geom_type_from_label(seg10)

        @jax.jit
        def f(p):
            acc = 0.0
            for _ in range(k):
                def sample_geom(kk):
                    m = oh0.T[kk]
                    pp = p[0] + acc * 0
                    from parsenet_tpu.ops.primitive_dist import (
                        GEOM_CONE, GEOM_CYLINDER, GEOM_SPHERE)
                    out = sample_plane(pr0.plane.normal[kk], pr0.plane.offset[kk],
                                       pp, m, SURF_GRID)
                    out = jnp.where(gt[kk] == GEOM_SPHERE,
                                    sample_sphere(pr0.sphere.center[kk],
                                                  pr0.sphere.radius[kk], SURF_GRID), out)
                    out = jnp.where(gt[kk] == GEOM_CYLINDER,
                                    sample_cylinder(pr0.cylinder.axis[kk],
                                                    pr0.cylinder.center[kk],
                                                    pr0.cylinder.radius[kk], pp, m,
                                                    SURF_GRID), out)
                    out = jnp.where(gt[kk] == GEOM_CONE,
                                    sample_cone(pr0.cone.apex[kk], pr0.cone.axis[kk],
                                                pr0.cone.theta[kk], pp, m, SURF_GRID), out)
                    return out
                surf = jax.vmap(sample_geom)(jnp.arange(K_MAX))
                acc = acc + jnp.sum(surf[:, 0])
            return acc
        return f

    def mk_preproc(k):
        @jax.jit
        def f(p, kk):
            acc = 0.0
            for _ in range(k):
                def one(pp, ll, kb):
                    ks = jax.random.split(kb, EVAL_SPLINE_SLOTS)
                    out = jax.vmap(lambda s, kx: eval_segment_points(
                        pp + acc * 0, ll == s, jnp.int32(CLOSED_PTS), kx,
                        n_out=CLOSED_PTS))(jnp.arange(EVAL_SPLINE_SLOTS), ks)
                    return jnp.sum(out[0])
                acc = acc + jnp.sum(jax.vmap(one)(p, labs, kk))
            return acc
        return f

    def mk_spline(k):
        pts_s = jnp.asarray(np.random.RandomState(1).randn(
            B, EVAL_SPLINE_SLOTS, CLOSED_PTS, 3).astype(np.float32))
        closed = jnp.zeros((B, EVAL_SPLINE_SLOTS), bool)

        @jax.jit
        def f():
            acc = 0.0
            for _ in range(k):
                out = jax.vmap(lambda a, c: spline_fit.batched_eval(
                    a + acc * 0, c))(pts_s, closed)
                acc = acc + jnp.sum(out[:, 0, 0])
            return acc
        return f

    def mk_dsamp(k):
        surf = jnp.asarray(np.random.RandomState(2).randn(
            B, K_MAX, SURF_GRID * SURF_GRID, 3).astype(np.float32))

        @jax.jit
        def f(p):
            acc = 0.0
            for _ in range(k):
                def one(pp, ll, sf):
                    own = sf[ll]
                    return jnp.sum(jax.vmap(
                        lambda q, s: jnp.min(jnp.sum((s - q) ** 2, -1)))(
                            pp + acc * 0, own))
                acc = acc + jnp.sum(jax.vmap(one)(p, labs, surf))
            return acc
        return f

    def mk_cov(k):
        surf = jnp.asarray(np.random.RandomState(3).randn(
            B, K_MAX * SURF_GRID * SURF_GRID, 3).astype(np.float32))
        msk = jnp.ones((B, K_MAX * SURF_GRID * SURF_GRID), jnp.float32)

        @jax.jit
        def f(p):
            acc = 0.0
            for _ in range(k):
                def one(pp, sf, mm):
                    d_in = min_sqdist(pp[None] + acc * 0, sf[None], mm[None])[0]
                    d_out = min_sqdist(sf[None] + acc * 0, pp[None])[0]
                    return jnp.sum(d_in) + jnp.sum(d_out)
                acc = acc + jnp.sum(jax.vmap(one)(p, surf, msk))
            return acc
        return f

    slope("fits (all primitives, 50 segs)", mk_fits, P)
    slope("geom sampling (50 segs x 4)", mk_sample, P)
    slope("eval preprocess (12 slots)", mk_preproc, P, keys)
    slope("spline decode batched_eval", mk_spline)
    slope("residual d_samp (own-surf min)", mk_dsamp, P)
    slope("coverage 2x min_sqdist", mk_cov, P)


if __name__ == "__main__":
    main()
