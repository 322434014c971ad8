"""End-to-end pipeline tests: fitting loss, trainers, eval, multi-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parsenet_tpu.data.synthetic import (make_shape, make_shape_batch,
                                         make_spline_batch)


@pytest.fixture(scope="module")
def tiny_shape():
    rng = np.random.RandomState(0)
    return make_shape(rng, num_points=512, min_segments=3, max_segments=5)


class TestFittingPipeline:
    def test_fitting_loss_runs_and_differentiates(self, tiny_shape):
        from parsenet_tpu.fitting.pipeline import fitting_loss_shape
        points, labels, normals, prim = tiny_shape

        def loss(emb):
            out = fitting_loss_shape(
                jnp.asarray(points), jnp.asarray(normals), emb,
                jnp.asarray(labels), jnp.asarray(prim),
                jax.random.PRNGKey(0), quantile=0.05, iterations=5,
                ms_num_samples=512)
            return out.loss, out

        # an informative embedding: one-hot-ish by gt segment + noise
        rng = np.random.RandomState(1)
        emb0 = np.eye(8)[labels % 8] + 0.05 * rng.randn(512, 8)
        emb = jnp.asarray(emb0, jnp.float32)
        (val, out), g = jax.value_and_grad(loss, has_aux=True)(emb)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(out.seg_iou) > 0.3  # informative embedding clusters okay

    def test_fitting_loss_with_splines(self, tiny_shape):
        from parsenet_tpu.fitting.pipeline import fitting_loss_shape
        from parsenet_tpu.train.train_e2e import build_spline_fit
        points, labels, normals, prim = tiny_shape
        spline_fit = build_spline_fit(grid=20, sample_grid=10)
        rng = np.random.RandomState(1)
        emb = jnp.asarray(np.eye(8)[labels % 8] + 0.05 * rng.randn(512, 8),
                          jnp.float32)
        out = fitting_loss_shape(
            jnp.asarray(points), jnp.asarray(normals), emb,
            jnp.asarray(labels), jnp.asarray(prim), jax.random.PRNGKey(0),
            spline_fit=spline_fit, quantile=0.05, iterations=5,
            ms_num_samples=512)
        assert np.isfinite(float(out.loss))


class TestEvalPipeline:
    def test_reconstruct_clean_geometric_shape(self):
        from parsenet_tpu.data import synthetic as syn
        from parsenet_tpu.eval.pipeline import reconstruct_shape
        # geometric-primitive-only shape: with GT segmentation the fitted
        # surfaces must cover nearly every point (no spline decoder needed)
        rng = np.random.RandomState(3)
        pts_l, lab_l, prim_l, nrm_l = [], [], [], []
        for s, kind in enumerate([syn.PRIM_PLANE, syn.PRIM_SPHERE,
                                  syn.PRIM_CYLINDER]):
            p, nn = syn.sample_patch(rng, kind, 170, rng.randn(3), 0.6)
            pts_l.append(p)
            nrm_l.append(nn)
            lab_l.append(np.full(170, s, np.int32))
            prim_l.append(np.full(170, kind, np.int32))
        points = np.concatenate(pts_l)
        normals = np.concatenate(nrm_l)
        labels = np.concatenate(lab_l)
        prim = np.concatenate(prim_l)
        rec = reconstruct_shape(jnp.asarray(points), jnp.asarray(normals),
                                jnp.asarray(labels), jnp.asarray(prim),
                                jax.random.PRNGKey(0), spline_fit=None)
        assert np.isfinite(float(rec.residual))
        assert float(rec.residual) < 0.02, float(rec.residual)
        # sk_2 follows the reference's coverage protocol (10k area-weighted
        # samples over the trimmed surfaces, test.py:153): on this toy
        # shape (~6 area units for 10k samples -> ~0.035 sample spacing,
        # comparable to the 0.02 threshold) the metric is
        # discretization-limited at ~0.78; real 10k-point shapes sit much
        # higher. The dense-grid check below carries the geometric intent.
        assert float(rec.sk_2) > 0.7, float(rec.sk_2)
        # dense-grid coverage: every input point has fitted surface nearby
        from parsenet_tpu.eval.pipeline import coverage_metrics
        flat = rec.surface_points.reshape(-1, 3)
        mask = jnp.repeat(rec.surface_mask.astype(jnp.float32),
                          rec.surface_points.shape[1])
        _, _, dense_sk2 = coverage_metrics(jnp.asarray(points), flat, mask)
        assert float(dense_sk2) > 0.9, float(dense_sk2)


class TestTrainSteps:
    def test_seg_train_step_decreases_loss(self):
        from parsenet_tpu.core.config import Config
        from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
        from parsenet_tpu.train.state import create_state
        from parsenet_tpu.train.train_seg import make_step_fns
        rng_np = np.random.RandomState(0)
        pts, labels, normals, prim = make_shape_batch(rng_np, 2, 256,
                                                      min_segments=2,
                                                      max_segments=4)
        x = np.concatenate([pts, normals], -1).astype(np.float32)
        model = PrimitivesEmbedding(emb_size=16, num_primitives=10, mode=5, k=8)
        state = create_state(model, jax.random.PRNGKey(0),
                             (jnp.zeros((2, 256, 6)),))
        train_step, eval_step = make_step_fns(model)
        xb = jnp.asarray(x)[None]  # 1 accumulation step
        lb = jnp.asarray(labels)[None]
        pb = jnp.asarray(prim)[None]
        losses = []
        for i in range(12):
            state, m = train_step(state, xb, lb, pb,
                                  jax.random.PRNGKey(i), jnp.float32(1e-3))
            losses.append(float(m["embed_loss"]) + float(m["prim_loss"]))
        assert losses[-1] < losses[0], losses
        assert float(m["grad_ok"]) == 1.0

    def test_spline_train_step_runs(self):
        from parsenet_tpu.losses.spline import (
            control_points_permute_reg_loss)
        from parsenet_tpu.models.splinenet import SplineNet
        from parsenet_tpu.ops.bspline import uniform_knot_bspline
        from parsenet_tpu.train.state import create_state
        from parsenet_tpu.train.train_spline import make_train_step
        rng_np = np.random.RandomState(0)
        pts, cps = make_spline_batch(rng_np, 4, num_points=128, grid=10)
        nu, nv = uniform_knot_bspline(10, 10, 3, 3, 20)
        model = SplineNet(grid=10, k=4, mode=0)
        state = create_state(model, jax.random.PRNGKey(0),
                             (jnp.zeros((4, 128, 3)),), train=True)
        train_step, eval_step = make_train_step(
            model, jnp.asarray(nu), jnp.asarray(nv), 10, closed=False,
            anisotropic=False)
        scales = jnp.ones((4, 3))
        losses = []
        for i in range(8):
            state, m = train_step(state, jnp.asarray(pts), jnp.asarray(cps),
                                  scales, jnp.float32(1e-3), jnp.float32(0.9))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses


class TestMultiDevice:
    def test_eight_device_mesh(self):
        assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"

    def test_seg_step_sharded(self):
        from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
        from parsenet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                replicate)
        from parsenet_tpu.train.state import create_state
        from parsenet_tpu.train.train_seg import make_step_fns
        mesh = make_mesh(8)
        rng_np = np.random.RandomState(0)
        pts, labels, normals, prim = make_shape_batch(rng_np, 8, 128,
                                                      min_segments=2,
                                                      max_segments=3)
        x = np.concatenate([pts, normals], -1).astype(np.float32)
        model = PrimitivesEmbedding(emb_size=8, num_primitives=10, mode=5, k=4)
        state = create_state(model, jax.random.PRNGKey(0),
                             (jnp.zeros((8, 128, 6)),))
        state = replicate(mesh, state)
        train_step, _ = make_step_fns(model)
        bsh = batch_sharding(mesh)
        xb = jax.device_put(jnp.asarray(x), bsh)[None]
        lb = jax.device_put(jnp.asarray(labels), bsh)[None]
        pb = jax.device_put(jnp.asarray(prim), bsh)[None]
        state, m = train_step(state, xb, lb, pb, jax.random.PRNGKey(0),
                              jnp.float32(1e-3))
        assert np.isfinite(float(m["embed_loss"]))

    def test_dryrun_multichip(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)


class TestSplineSlots:
    def test_batched_matches_sequential(self):
        from parsenet_tpu.train.train_e2e import build_spline_fit
        rng = np.random.RandomState(0)
        spline_fit = build_spline_fit(grid=20, sample_grid=10)
        pts = jnp.asarray(rng.randn(3, 200, 3).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 200).astype(np.float32))
        closed = jnp.asarray([False, True, False])
        batched = spline_fit.batched(pts, w, closed)
        seq = jnp.stack([spline_fit(pts[i], w[i], closed[i])
                         for i in range(3)])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(seq),
                                   rtol=1e-4, atol=1e-5)


class TestAreaWeights:
    def test_sphere_grid_weights_follow_sin_polar(self):
        # lat-long sphere sampling: area element ~ sin(theta); poles ~ 0
        from parsenet_tpu.eval.pipeline import _area_weights
        g = 32
        th = np.linspace(0, np.pi, g)
        ph = np.linspace(0, 2 * np.pi, g)
        T, P = np.meshgrid(th, ph, indexing="ij")
        s = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                      np.cos(T)], -1)
        w = np.asarray(_area_weights(jnp.asarray(s.reshape(-1, 3),
                                                 jnp.float32))).reshape(g, g)
        mid, pole = w[g // 2].mean(), w[1].mean()
        assert mid > 3.0 * pole  # equator cells much larger than near-pole
        # plane grid: uniform interior weights
        u = np.linspace(0, 1, g)
        U, V = np.meshgrid(u, u, indexing="ij")
        p = np.stack([U, V, np.zeros_like(U)], -1)
        wp = np.asarray(_area_weights(jnp.asarray(p.reshape(-1, 3),
                                                  jnp.float32))).reshape(g, g)
        interior = wp[1:-1, 1:-1]
        assert np.allclose(interior, interior[0, 0], rtol=1e-4)

    def test_coverage_metrics_weighting(self):
        from parsenet_tpu.eval.pipeline import coverage_metrics
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(64, 3), jnp.float32)
        surf = jnp.asarray(rng.randn(128, 3), jnp.float32)
        mask = jnp.ones((128,), jnp.float32)
        cov_u, s1u, s2u = coverage_metrics(pts, surf, mask)
        # uniform weights reproduce the unweighted metric exactly
        cov_w, s1w, s2w = coverage_metrics(pts, surf, mask,
                                           2.5 * jnp.ones((128,)))
        assert np.allclose(float(cov_u), float(cov_w), atol=1e-6)
        assert float(s1u) == float(s1w) and float(s2u) == float(s2w)
        # concentrating weight on the farthest surface sample raises cov
        from parsenet_tpu.ops.chamfer import min_sqdist
        d_out = np.asarray(min_sqdist(surf[None], pts[None])[0])
        w = np.full((128,), 1e-6, np.float32)
        w[np.argmax(d_out)] = 1.0
        cov_far, _, _ = coverage_metrics(pts, surf, mask, jnp.asarray(w))
        assert float(cov_far) > float(cov_u)

    def test_reconstruct_exposes_area_weights(self):
        from parsenet_tpu.eval.pipeline import reconstruct_shape
        pts, labels, normals, prim = make_shape(np.random.RandomState(3), 800)
        rec = reconstruct_shape(jnp.asarray(pts), jnp.asarray(normals),
                                jnp.asarray(labels), jnp.asarray(prim),
                                jax.random.PRNGKey(0))
        w = np.asarray(rec.area_weights)
        assert w.shape == rec.surface_points.shape[:2]
        assert np.all(w >= 0) and np.isfinite(w).all()


class TestCheckpointDurability:
    def test_save_is_committed_on_return(self, tmp_path):
        from parsenet_tpu.core.checkpoint import Checkpointer
        import os
        c = Checkpointer(str(tmp_path / "ck"))
        c.save(0, {"params": {"w": jnp.ones((8, 8))}})
        entries = os.listdir(str(tmp_path / "ck"))
        assert "0" in entries
        assert not any(e.endswith(".orbax-checkpoint-tmp") for e in entries)
