"""Unit tests for the geometry op layer against tiny numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parsenet_tpu.ops import knn as knn_ops
from parsenet_tpu.ops import chamfer as chamfer_ops
from parsenet_tpu.ops import bspline as bs
from parsenet_tpu.ops import hungarian


class TestKNN:
    def test_matches_bruteforce(self, rng):
        x = rng.randn(2, 64, 3).astype(np.float32)
        idx = np.asarray(knn_ops.knn(jnp.asarray(x), k1=8))
        for b in range(2):
            d = ((x[b][:, None, :] - x[b][None, :, :]) ** 2).sum(-1)
            ref = np.argsort(d, axis=1, kind="stable")[:, :8]
            # sets must agree (ties may reorder)
            for i in range(64):
                got = set(idx[b, i].tolist())
                dref = np.sort(d[i])[:8]
                dgot = np.sort(d[i][list(got)])
                np.testing.assert_allclose(dgot, dref, rtol=1e-5, atol=1e-6)

    def test_dilated_selection(self, rng):
        x = rng.randn(1, 32, 3).astype(np.float32)
        idx = np.asarray(knn_ops.knn(jnp.asarray(x), k1=4, k2=16))
        d = ((x[0][:, None, :] - x[0][None, :, :]) ** 2).sum(-1)
        full = np.argsort(d, axis=1)[:, :16]
        # stride-4 selection out of top-16 (reference: PointNet.py:11)
        for i in range(32):
            expect = d[i][full[i, ::4]]
            got = d[i][idx[0, i]]
            np.testing.assert_allclose(np.sort(got), np.sort(expect), rtol=1e-5)

    def test_points_normals_metric(self, rng):
        p = rng.randn(1, 40, 3).astype(np.float32)
        n = rng.randn(1, 40, 3).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        x = np.concatenate([p, n], -1)
        idx = np.asarray(knn_ops.knn_points_normals(jnp.asarray(x), k1=6))
        dp = ((p[0][:, None] - p[0][None]) ** 2).sum(-1)
        dn = 2 - 2 * n[0] @ n[0].T
        d = dp * (1 + dn)
        for i in range(40):
            expect = np.sort(d[i])[:6]
            got = np.sort(d[i][idx[0, i]])
            np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    def test_edge_features(self, rng):
        x = rng.randn(1, 16, 3).astype(np.float32)
        idx = knn_ops.knn(jnp.asarray(x), k1=4)
        f = knn_ops.edge_features(jnp.asarray(x), idx)
        assert f.shape == (1, 16, 4, 6)
        f = np.asarray(f)
        i, j = 5, 2
        nb = int(np.asarray(idx)[0, i, j])
        np.testing.assert_allclose(f[0, i, j, :3], x[0, nb] - x[0, i], rtol=1e-6)
        np.testing.assert_allclose(f[0, i, j, 3:], x[0, i], rtol=1e-6)


class TestChamfer:
    def test_identity_zero(self, rng):
        x = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
        assert float(chamfer_ops.chamfer_distance(x, x)) < 1e-6

    def test_matches_bruteforce(self, rng):
        x = rng.randn(2, 24, 3).astype(np.float32)
        y = rng.randn(2, 40, 3).astype(np.float32)
        got = float(chamfer_ops.chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
        accum = 0.0
        for b in range(2):
            d = ((x[b][:, None] - y[b][None]) ** 2).sum(-1)
            accum += 0.5 * (d.min(1).mean() + d.min(0).mean())
        np.testing.assert_allclose(got, accum / 2, rtol=1e-4)

    def test_mask_excludes_points(self, rng):
        x = rng.randn(1, 8, 3).astype(np.float32)
        y = np.concatenate([x, 100 + rng.randn(1, 8, 3).astype(np.float32)], 1)
        ymask = np.concatenate([np.ones((1, 8)), np.zeros((1, 8))], 1).astype(np.float32)
        d = float(chamfer_ops.chamfer_distance(
            jnp.asarray(x), jnp.asarray(y), y_mask=jnp.asarray(ymask)))
        assert d < 1e-6

    def test_one_sided(self, rng):
        x = rng.randn(1, 16, 3).astype(np.float32)
        y = rng.randn(1, 16, 3).astype(np.float32)
        # side=1 is the reference direction: per-GT(y) min over predictions
        d1 = float(chamfer_ops.chamfer_distance_one_side(
            jnp.asarray(x), jnp.asarray(y), side=1))
        d = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
        np.testing.assert_allclose(d1, d.min(0).mean(), rtol=1e-4)
        d0 = float(chamfer_ops.chamfer_distance_one_side(
            jnp.asarray(x), jnp.asarray(y), side=0))
        np.testing.assert_allclose(d0, d.min(1).mean(), rtol=1e-4)


class TestBSpline:
    def test_partition_of_unity(self):
        nu, nv = bs.uniform_knot_bspline(20, 20, 3, 3, grid_size=40)
        np.testing.assert_allclose(nu.sum(1), 1.0, atol=1e-6)
        np.testing.assert_allclose(nv.sum(1), 1.0, atol=1e-6)
        assert nu.shape == (40, 20)

    def test_matches_reference_algorithm(self):
        # golden values from direct evaluation of Alg 2.4 on a small case
        kv = bs.uniform_knots(4, 3)  # cubic bezier knots [0,0,0,0,1,1,1,1]
        # at t=0.5 cubic Bezier basis = [0.125, 0.375, 0.375, 0.125]
        vals = [bs.basis_function_one(3, kv, j, 0.5) for j in range(4)]
        np.testing.assert_allclose(vals, [0.125, 0.375, 0.375, 0.125], atol=1e-12)

    def test_sample_surface_plane(self):
        # control grid on z=0 plane -> all samples on the plane
        u = np.linspace(0, 1, 20)
        cp = np.zeros((20, 20, 3), np.float32)
        cp[..., 0] = u[:, None]
        cp[..., 1] = u[None, :]
        nu, nv = bs.uniform_knot_bspline(20, 20, 3, 3, 30)
        pts = np.asarray(bs.sample_surface(jnp.asarray(nu), jnp.asarray(nv),
                                           jnp.asarray(cp)))
        assert pts.shape == (900, 3)
        np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-6)

    def test_kronecker_fit_recovers_plane(self, rng):
        # sample scattered points from a bilinear surface; fit control grid;
        # resampling must reproduce the surface
        uv = rng.rand(500, 2).astype(np.float32)
        pts = np.stack([uv[:, 0], uv[:, 1], 0.3 * uv[:, 0] * uv[:, 1]], 1)
        nu_p = bs.basis_matrix_at(uv[:, 0], 10, 3)
        nv_p = bs.basis_matrix_at(uv[:, 1], 10, 3)
        w = np.ones(500, np.float32)
        cp = bs.fit_surface_kronecker(jnp.asarray(nu_p), jnp.asarray(nv_p),
                                      jnp.asarray(pts), jnp.asarray(w))
        recon = np.asarray(
            jnp.einsum("mu,uvc,mv->mc", jnp.asarray(nu_p), cp, jnp.asarray(nv_p)))
        err = np.abs(recon - pts).max()
        assert err < 1e-2, err


class TestHungarian:
    def test_matches_scipy(self, rng):
        for n in (5, 20, 50):
            for _ in range(3):
                cost = rng.rand(n, n).astype(np.float32)
                col = np.asarray(hungarian.solve_lap(jnp.asarray(cost)))
                assert sorted(col.tolist()) == list(range(n)), "not a permutation"
                got = cost[np.arange(n), col].sum()
                rid, cid = hungarian.solve_lap_host(cost)
                ref = cost[rid, cid].sum()
                np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_identity(self):
        cost = 1.0 - np.eye(10, dtype=np.float32)
        col = np.asarray(hungarian.solve_lap(jnp.asarray(cost)))
        np.testing.assert_array_equal(col, np.arange(10))

    def test_padded_siou_structure(self, rng):
        """Realistic SIOU matrices: few real segments + a block of empty
        (uniform cost 1.0) padding rows/columns. The padding rows used to
        drive the auction past its iteration budget and leak -1 rows."""
        for trial in range(6):
            n, n_pred, n_gt, npts = 50, rng.randint(4, 16), rng.randint(4, 16), 4000
            gt = rng.randint(0, n_gt, npts)
            pred = np.where(rng.rand(npts) < 0.85, np.minimum(gt, n_pred - 1),
                            rng.randint(0, n_pred, npts))
            poh = np.eye(n, dtype=np.float32)[pred]
            goh = np.eye(n, dtype=np.float32)[gt]
            dots = poh.T @ goh
            iou = dots / (poh.sum(0)[:, None] + goh.sum(0)[None, :] - dots + 1e-7)
            cost = (1.0 - iou).astype(np.float32)
            col = np.asarray(hungarian.solve_lap(jnp.asarray(cost)))
            assert sorted(col.tolist()) == list(range(n)), "not a permutation"
            got = cost[np.arange(n), col].sum()
            rid, cid = hungarian.solve_lap_host(cost)
            np.testing.assert_allclose(got, cost[rid, cid].sum(), atol=2e-3)

    def test_near_tie_terminates(self, rng):
        """Adversarial near-tie matrix (all rows within 1e-4): eps
        escalation must terminate it with a valid permutation and cost
        within the coarsened n*eps bound."""
        base = rng.rand(50).astype(np.float32)
        cost = np.tile(base, (50, 1)) + 1e-4 * rng.rand(50, 50).astype(np.float32)
        col = np.asarray(hungarian.solve_lap(jnp.asarray(cost)))
        assert sorted(col.tolist()) == list(range(50)), "not a permutation"
        got = cost[np.arange(50), col].sum()
        rid, cid = hungarian.solve_lap_host(cost)
        np.testing.assert_allclose(got, cost[rid, cid].sum(), atol=6e-3)
