"""Tests for the native C++ components and host post-processing."""
import numpy as np
import pytest

from parsenet_tpu import cpp as native
from parsenet_tpu.postprocess import (optimize_spline_kronecker,
                                      tessellate_grid, trim_mesh_by_distance,
                                      up_sample_points_in_range, write_ply)
from parsenet_tpu.postprocess.meshing import read_ply, remove_unreferenced, sample_mesh

needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native lib unavailable")


@needs_native
class TestNativeLAP:
    def test_matches_scipy(self, rng):
        from scipy.optimize import linear_sum_assignment
        for n in (3, 17, 50, 128):
            cost = rng.rand(n, n)
            r, c = native.solve_dense(cost)
            rs, cs = linear_sum_assignment(cost)
            assert sorted(c.tolist()) == list(range(n))
            np.testing.assert_allclose(cost[r, c].sum(), cost[rs, cs].sum(),
                                       atol=1e-9)

    def test_degenerate_ties(self):
        cost = np.ones((50, 50))
        cost[np.arange(5), np.arange(5)] = 0.0
        r, c = native.solve_dense(cost)
        assert cost[r, c].sum() == 45.0


@needs_native
class TestOutliers:
    def test_removes_far_points(self, rng):
        pts = np.concatenate([rng.randn(300, 3).astype(np.float32) * 0.1,
                              np.float32([[9, 9, 9], [-9, 0, 0]])])
        kept = native.remove_outliers(pts, 20, 2.0)
        assert kept.shape[0] <= 300
        assert np.abs(kept).max() < 5


@needs_native
class TestARAP:
    def test_handles_pinned_and_smooth(self):
        g = 10
        u = np.linspace(0, 1, g).astype(np.float32)
        uu, vv = np.meshgrid(u, u, indexing="ij")
        V = np.stack([uu, vv, np.zeros_like(uu)], -1).reshape(-1, 3)
        _, T = tessellate_grid(V, g, g)
        hidx = np.array([0, g - 1, (g - 1) * g, g * g - 1], np.int32)
        hpos = V[hidx].copy()
        hpos[3, 2] = 0.4
        V2 = native.arap_deform(V, T, hidx, hpos, max_iter=20)
        np.testing.assert_allclose(V2[hidx], hpos, atol=1e-3)
        assert np.isfinite(V2).all()
        # interior bends smoothly toward the lifted corner
        assert V2[:, 2].max() <= 0.45 and V2[:, 2].max() > 0.05


class TestMeshing:
    def test_tessellate_counts(self):
        pts = np.zeros((12, 3), np.float32)
        v, t = tessellate_grid(pts, 3, 4)
        assert len(v) == 12 and len(t) == 2 * 2 * 3
        v, t = tessellate_grid(pts, 3, 4, wrap_u=True)
        assert len(t) == 2 * 3 * 3

    def test_trim(self, rng):
        u = np.linspace(0, 1, 10).astype(np.float32)
        uu, vv = np.meshgrid(u, u, indexing="ij")
        V = np.stack([uu, vv, np.zeros_like(uu)], -1).reshape(-1, 3)
        _, T = tessellate_grid(V, 10, 10)
        # input points only on the left half -> right-half triangles trimmed
        pts = V[V[:, 0] < 0.45]
        T2 = trim_mesh_by_distance(V, T, pts, epsilon=0.1)
        cent = V[T2].mean(1)
        assert cent[:, 0].max() < 0.65
        assert len(T2) > 0

    def test_ply_roundtrip(self, rng, tmp_path):
        V = rng.rand(20, 3).astype(np.float32)
        _, T = tessellate_grid(V, 4, 5)
        p = str(tmp_path / "m.ply")
        write_ply(p, V, T)
        V2, T2 = read_ply(p)
        np.testing.assert_allclose(V, V2, atol=1e-5)
        np.testing.assert_array_equal(T, T2)

    def test_sample_mesh_area_weighted(self, rng):
        # two triangles, one 100x larger -> gets ~99% of samples
        V = np.float32([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                        [10, 0, 0], [10, 0.1, 0], [10.1, 0, 0]])
        T = np.int32([[0, 1, 2], [3, 4, 5]])
        s = sample_mesh(V, T, 1000)
        frac_big = np.mean(s[:, 0] < 5)
        assert frac_big > 0.95

    def test_remove_unreferenced(self):
        V = np.zeros((10, 3), np.float32)
        T = np.int32([[2, 3, 4]])
        V2, T2 = remove_unreferenced(V, T)
        assert len(V2) == 3 and T2.tolist() == [[0, 1, 2]]


class TestSplineOptimize:
    def test_refit_improves_noisy_surface(self, rng):
        # ground-truth smooth surface; "prediction" = corrupted samples;
        # refit vs inputs from the true surface must reduce the error
        u = np.linspace(0, 1, 30).astype(np.float32)
        uu, vv = np.meshgrid(u, u, indexing="ij")
        z = 0.3 * np.sin(uu * 3) * np.cos(vv * 2)
        true_surf = np.stack([uu, vv, z], -1).reshape(-1, 3)
        pred_surf = true_surf + 0.05 * rng.randn(*true_surf.shape).astype(np.float32)
        inputs = true_surf[rng.choice(900, 700, replace=False)]
        refined = optimize_spline_kronecker(pred_surf, inputs,
                                            grid_u=30, grid_v=30,
                                            eval_grid=(30, 30))

        def err(s):
            d = ((s[:, None] - true_surf[None]) ** 2).sum(-1)
            return np.sqrt(d.min(1)).mean()

        assert err(refined) < err(pred_surf), (err(refined), err(pred_surf))


class TestUpsample:
    def test_in_range(self, rng):
        pts = rng.randn(130, 3).astype(np.float32)
        out = up_sample_points_in_range(pts, 1000, 1500)
        assert 1000 <= out.shape[0] <= 1500
        # upsampled points stay near the originals
        d = ((out[:, None] - pts[None]) ** 2).sum(-1).min(1)
        assert np.sqrt(d).max() < 5.0
