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
