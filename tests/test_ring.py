"""Point-axis-sharded ring kernels vs single-device references (8-dev mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.parallel.mesh import make_mesh
from parsenet_tpu.parallel.ring import ring_knn, ring_min_sqdist


class TestRingChamfer:
    def test_matches_dense(self, rng):
        mesh = make_mesh(8)
        q = rng.randn(256, 3).astype(np.float32)
        x = rng.randn(512, 3).astype(np.float32)
        d, idx = ring_min_sqdist(mesh, jnp.asarray(q), jnp.asarray(x))
        ref = ((q[:, None] - x[None]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d), ref.min(1), rtol=1e-5,
                                   atol=1e-6)
        # argmin points at a true minimizer
        np.testing.assert_allclose(ref[np.arange(256), np.asarray(idx)],
                                   ref.min(1), rtol=1e-5, atol=1e-6)


class TestRingKNN:
    def test_matches_dense(self, rng):
        mesh = make_mesh(8)
        x = rng.randn(512, 8).astype(np.float32)
        idx = np.asarray(ring_knn(mesh, jnp.asarray(x), k=16))
        d = ((x[:, None] - x[None]) ** 2).sum(-1)
        for i in range(0, 512, 37):
            got = np.sort(d[i][idx[i]])
            ref = np.sort(d[i])[:16]
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_matches_ops_knn_exact(self, rng):
        """Sharded ring kNN == the single-device exact kNN op (same sets)."""
        from parsenet_tpu.ops.knn import knn as dense_knn
        mesh = make_mesh(8)
        x = rng.randn(256, 3).astype(np.float32)
        idx_ring = np.asarray(ring_knn(mesh, jnp.asarray(x), k=8))
        idx_dense = np.asarray(dense_knn(jnp.asarray(x[None]), 8,
                                         exact=True))[0]
        # the dense op includes self as its own nearest neighbour; so does
        # the ring merge — compare the sets
        np.testing.assert_array_equal(np.sort(idx_ring, -1),
                                      np.sort(idx_dense, -1))

    def test_k_larger_than_shard(self, rng):
        """k > per-device shard size exercises the min(k, shard) clamp in
        the running merge."""
        mesh = make_mesh(8)
        x = rng.randn(128, 4).astype(np.float32)   # 16 points per shard
        idx = np.asarray(ring_knn(mesh, jnp.asarray(x), k=24))
        d = ((x[:, None] - x[None]) ** 2).sum(-1)
        for i in range(0, 128, 17):
            np.testing.assert_allclose(np.sort(d[i][idx[i]]),
                                       np.sort(d[i])[:24],
                                       rtol=1e-4, atol=1e-5)


class TestRingComposition:
    def test_two_sided_chamfer_from_ring(self, rng):
        """Two-sided chamfer assembled from two ring passes matches the
        dense masked chamfer op."""
        from parsenet_tpu.ops.chamfer import chamfer_distance
        mesh = make_mesh(8)
        x = rng.randn(256, 3).astype(np.float32)
        y = rng.randn(512, 3).astype(np.float32)
        d_xy, _ = ring_min_sqdist(mesh, jnp.asarray(x), jnp.asarray(y))
        d_yx, _ = ring_min_sqdist(mesh, jnp.asarray(y), jnp.asarray(x))
        ring_cd = 0.5 * (float(jnp.mean(d_xy)) + float(jnp.mean(d_yx)))
        dense_cd = float(chamfer_distance(jnp.asarray(x[None]),
                                          jnp.asarray(y[None])))
        np.testing.assert_allclose(ring_cd, dense_cd, rtol=1e-5, atol=1e-7)

    def test_duplicate_points_zero_distance(self, rng):
        """Identical points across shards: min distance must be exactly 0
        and the argmin must point at a true duplicate."""
        mesh = make_mesh(8)
        x = rng.randn(256, 3).astype(np.float32)
        q = x[::2].copy()   # every query exists in x
        d, idx = ring_min_sqdist(mesh, jnp.asarray(q), jnp.asarray(x))
        assert float(jnp.max(d)) < 1e-5
        np.testing.assert_allclose(x[np.asarray(idx)], q, atol=1e-6)
