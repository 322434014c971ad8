"""Tests for auxiliary subsystems: metrics, save/export, viz, features, config."""
import numpy as np
import pytest

from parsenet_tpu.core.config import Config, load_config
from parsenet_tpu.eval import metrics
from parsenet_tpu.data import features


class TestConfig:
    def test_reads_reference_style_file(self, tmp_path):
        p = tmp_path / "c.yml"
        p.write_text("""comment=""\n[train]\nmodel_path = "m_{}"\n"""
                     """batch_size = 4\nlr = 0.01\nnormals = True\nmode = 5\n""")
        cfg = load_config(str(p))
        assert cfg.batch_size == 4 and cfg.lr == 0.01
        assert cfg.normals is True and cfg.mode == 5

    def test_snapshot_roundtrip(self, tmp_path):
        cfg = Config(batch_size=7)
        cfg.write(str(tmp_path / "snap.json"))
        import json
        snap = json.load(open(tmp_path / "snap.json"))
        assert snap["batch_size"] == 7


class TestMetrics:
    def test_p_coverage(self):
        pts = np.zeros((10, 3), np.float32)
        surf = np.zeros((5, 3), np.float32)
        assert metrics.p_coverage(pts, surf, 0.01) == 1.0
        surf2 = surf + 1.0
        assert metrics.p_coverage(pts, surf2, 0.01) == 0.0

    def test_separate_losses(self):
        total, geom, spline = metrics.separate_losses_np(
            {0: 0.1, 1: 2.0, 2: 0.3, 3: None},
            {0: "plane", 1: "cone", 2: "open-spline", 3: "sphere"},
            lamb=0.5)
        # 2.0 clamps to 0.1; spline scaled by lamb in the total
        np.testing.assert_allclose(geom, np.mean([0.1, 0.1]))
        np.testing.assert_allclose(spline, 0.3)
        np.testing.assert_allclose(total, np.mean([0.1, 0.1, 0.15]))

    def test_remove_unassigned(self):
        pts = np.array([[0, 0, 0], [1, 0, 0], [0.1, 0, 0]], np.float32)
        labels = np.array([1, 2, 100])
        out = metrics.remove_unassigned(labels, pts)
        assert out.tolist() == [1, 2, 1]


class TestFeatureSampling:
    def test_plane_cylinder_sphere_cone_torus(self):
        for t in ("plane", "cylinder", "sphere", "cone", "torus"):
            feat = {"type": t, "location": [0, 0, 0], "axis": [0, 0, 1],
                    "radius": 0.5, "angle": 0.4, "max_radius": 1.0,
                    "min_radius": 0.2}
            pts = features.sample_feature(feat, grid=10)
            assert pts.shape == (100, 3) and np.isfinite(pts).all(), t

    def test_sphere_radius(self):
        pts = features.sample_feature(
            {"type": "sphere", "location": [1, 2, 3], "radius": 0.7}, 12)
        r = np.linalg.norm(pts - np.array([1, 2, 3]), axis=1)
        np.testing.assert_allclose(r, 0.7, atol=1e-5)

    def test_bspline_flat_grid(self):
        # flat control grid -> surface on the plane z=0
        g = 6
        u = np.linspace(0, 1, g)
        uu, vv = np.meshgrid(u, u, indexing="ij")
        cps = np.stack([uu, vv, np.zeros_like(uu)], -1)
        feat = {"type": "bspline", "control_points": cps,
                "u_knots": [0, 0, 0, 0, 1/3, 2/3, 1, 1, 1, 1],
                "v_knots": [0, 0, 0, 0, 1/3, 2/3, 1, 1, 1, 1],
                "u_degree": 3, "v_degree": 3}
        pts = features.sample_feature(feat, grid=15)
        assert np.abs(pts[:, 2]).max() < 1e-6
        assert pts[:, 0].min() >= -1e-6 and pts[:, 0].max() <= 1 + 1e-6

    def test_unsupported_returns_none(self):
        assert features.sample_feature({"type": "revolution"}) is None


class TestViz:
    def test_colored_ply_and_grid(self, tmp_path, rng):
        from parsenet_tpu.postprocess import viz
        pts = rng.rand(50, 3).astype(np.float32)
        labels = rng.randint(0, 5, 50)
        viz.save_segmentation_ply(str(tmp_path / "seg.ply"), pts, labels)
        assert (tmp_path / "seg.ply").exists()
        grid = viz.grid_of_shapes([pts, pts, pts], cols=2)
        assert grid.shape == (150, 3)
        # shapes are offset apart
        assert grid[:50, 0].max() < grid[50:100, 0].min()

    def test_save_xyz(self, tmp_path, rng):
        from parsenet_tpu.postprocess import viz
        pts = rng.rand(10, 3).astype(np.float32)
        viz.save_xyz(str(tmp_path / "p.xyz"), pts)
        back = np.loadtxt(tmp_path / "p.xyz")
        np.testing.assert_allclose(back, pts, atol=1e-5)

    def test_render_meshes_png(self, tmp_path):
        """Offline screenshot equivalent (reference VisUtils.py:246-400)."""
        from parsenet_tpu.postprocess import viz
        from parsenet_tpu.postprocess.meshing import tessellate_grid
        u = np.linspace(0, np.pi, 12)
        v = np.linspace(0, 2 * np.pi, 12)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        sphere = np.stack([np.sin(uu) * np.cos(vv), np.sin(uu) * np.sin(vv),
                           np.cos(uu)], -1).reshape(-1, 3)
        verts, tris = tessellate_grid(sphere, 12, 12)
        p = tmp_path / "mesh.png"
        ok = viz.render_meshes_png(str(p), [(verts, tris, (0.8, 0.5, 0.4))])
        assert ok and p.exists() and p.stat().st_size > 1000

    def test_render_reconstruction_grid(self, tmp_path):
        from parsenet_tpu.postprocess import viz
        from parsenet_tpu.postprocess.meshing import tessellate_grid
        uu, vv = np.meshgrid(np.linspace(0, 1, 6), np.linspace(0, 1, 6),
                             indexing="ij")
        g = np.stack([uu, vv, np.zeros((6, 6))], -1).reshape(-1, 3)
        verts, tris = tessellate_grid(g, 6, 6)
        shapes = [[(verts, tris, 0), (verts + 0.2, tris, 1)],
                  [(verts, tris, 2)]]
        p = tmp_path / "grid.png"
        assert viz.render_reconstruction_grid(str(p), shapes)
        assert p.exists() and p.stat().st_size > 1000


class TestSaveParams:
    def test_roundtrip_and_export(self, tmp_path, rng):
        import jax
        import jax.numpy as jnp
        from parsenet_tpu.eval import save_params
        from parsenet_tpu.ops.primitive_fits import fit_all_primitives_shared_points
        # one plane segment
        pts = np.c_[rng.rand(200, 2), np.zeros(200)].astype(np.float32)
        nrm = np.tile([0, 0, 1.0], (200, 1)).astype(np.float32)
        W = np.ones((1, 200), np.float32)
        params = fit_all_primitives_shared_points(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(W))
        d = save_params.params_to_dict(params, np.array([0]), np.array([True]))
        path = str(tmp_path / "params.h5")
        save_params.save_h5(path, d)
        back = save_params.load_h5(path)
        np.testing.assert_allclose(back["plane_normal"], d["plane_normal"])
        files = save_params.export_shape_meshes(
            back, pts, np.zeros(200, np.int64), str(tmp_path / "meshes"),
            epsilon=0.2)
        assert len(files) == 1 and files[0].endswith("plane.ply")


class TestDebugNans:
    def test_train_step_clean_under_debug_nans(self):
        """SURVEY §5 sanitizer item: a healthy train step must not trip
        jax.debug_nans (the reference's equivalent is detect_anomaly +
        grad_norm guards)."""
        import jax
        import jax.numpy as jnp
        from parsenet_tpu.data.synthetic import make_shape_batch
        from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
        from parsenet_tpu.train.state import create_state
        from parsenet_tpu.train.train_seg import make_step_fns
        rng = np.random.RandomState(0)
        pts, labels, normals, prim = make_shape_batch(rng, 2, 128,
                                                      min_segments=2,
                                                      max_segments=3)
        x = np.concatenate([pts, normals], -1).astype(np.float32)
        model = PrimitivesEmbedding(emb_size=8, num_primitives=10, mode=5, k=4)
        state = create_state(model, jax.random.PRNGKey(0),
                             (jnp.zeros((2, 128, 6)),))
        train_step, _ = make_step_fns(model)
        with jax.debug_nans(True):
            state, m = train_step(state, jnp.asarray(x)[None],
                                  jnp.asarray(labels)[None],
                                  jnp.asarray(prim)[None],
                                  jax.random.PRNGKey(1), jnp.float32(1e-3))
            assert np.isfinite(float(m["embed_loss"]))


class TestPrefetch:
    def test_prefetch_preserves_order_and_values(self, rng):
        import jax.numpy as jnp
        from parsenet_tpu.data.prefetch import prefetch_to_device

        def gen():
            for i in range(5):
                yield {"x": np.full((4, 3), i, np.float32), "i": i}

        out = list(prefetch_to_device(gen(), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert int(np.asarray(b["i"])) == i
            np.testing.assert_allclose(np.asarray(b["x"]), i)


class TestStepTimer:
    def test_summary(self):
        import time
        from parsenet_tpu.core.profiling import StepTimer
        t = StepTimer(skip_first=1)
        for _ in range(4):
            t.start()
            time.sleep(0.01)
            t.stop()
        s = t.summary()
        assert s["n"] == 3 and 0.005 < s["mean_s"] < 0.2
        assert s["steps_per_s"] > 0


class TestShippedConfigs:
    def test_all_configs_parse(self):
        import glob
        from parsenet_tpu.core.config import load_config
        files = sorted(glob.glob("configs/*.yml"))
        assert len(files) >= 9
        for f in files:
            cfg = load_config(f)
            assert cfg.batch_size >= 1 and cfg.grid_size == 20, f
