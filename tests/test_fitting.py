"""Parameter-recovery tests for the fitting stack.

Mirrors the reference's de-facto test idiom (src/test_fitting_utils.py):
sample a synthetic surface with known parameters -> fit -> assert recovery,
plus gradient checks through the fits.
"""
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.ops import primitive_fits as fits
from parsenet_tpu.ops import primitive_dist as pdist

jax.config.update("jax_enable_x64", False)


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def sample_plane(rng, n=512, normal=(0., 0., 1.), d=0.3):
    a = _unit(normal)
    # basis of the plane
    b1 = _unit(np.cross(a, [1, 0.3, 0.2]))
    b2 = np.cross(a, b1)
    uv = rng.randn(n, 2).astype(np.float32)
    pts = d * a + uv[:, :1] * b1 + uv[:, 1:] * b2
    normals = np.tile(a, (n, 1)).astype(np.float32)
    return pts.astype(np.float32), normals


def sample_sphere(rng, n=512, center=(0.2, -0.1, 0.5), radius=0.8):
    v = rng.randn(n, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (np.asarray(center, np.float32) + radius * v), v


def sample_cylinder(rng, n=512, axis=(0., 0., 1.), center=(0.1, 0.2, 0.), radius=0.5):
    a = _unit(axis)
    b1 = _unit(np.cross(a, [1, 0.2, 0.1]))
    b2 = np.cross(a, b1)
    theta = rng.rand(n).astype(np.float32) * 2 * np.pi
    h = (rng.rand(n).astype(np.float32) - 0.5) * 2
    ring = np.cos(theta)[:, None] * b1 + np.sin(theta)[:, None] * b2
    pts = np.asarray(center, np.float32) + radius * ring + h[:, None] * a
    return pts.astype(np.float32), ring.astype(np.float32)


def sample_cone(rng, n=512, apex=(0., 0., 0.), axis=(0., 0., 1.), theta=0.4):
    a = _unit(axis)
    b1 = _unit(np.cross(a, [1, 0.2, 0.1]))
    b2 = np.cross(a, b1)
    phi = rng.rand(n).astype(np.float32) * 2 * np.pi
    t = 0.2 + rng.rand(n).astype(np.float32)  # distance along the cone
    ring = np.cos(phi)[:, None] * b1 + np.sin(phi)[:, None] * b2
    pts = (np.asarray(apex, np.float32)
           + t[:, None] * (np.cos(theta) * a + np.sin(theta) * ring))
    # outward normal of a cone surface point
    normals = np.cos(theta) * ring - np.sin(theta) * a
    return pts.astype(np.float32), normals.astype(np.float32)


class TestPlane:
    def test_recovery(self, rng):
        pts, nrm = sample_plane(rng, normal=(0.3, -0.5, 0.8), d=0.37)
        w = jnp.ones(pts.shape[0])
        p = fits.fit_plane(jnp.asarray(pts), w)
        a_ref = _unit((0.3, -0.5, 0.8))
        a = np.asarray(p.normal)
        assert abs(abs(a @ a_ref) - 1) < 1e-4
        # signed offset consistent with fitted normal direction
        d = float(p.offset) * np.sign(a @ a_ref)
        np.testing.assert_allclose(abs(d), 0.37, atol=1e-3)

    def test_residual_zero(self, rng):
        pts, _ = sample_plane(rng)
        w = jnp.ones(pts.shape[0])
        p = fits.fit_plane(jnp.asarray(pts), w)
        d = pdist.sqdist_plane(jnp.asarray(pts), p.normal, p.offset)
        assert float(jnp.mean(d)) < 1e-6

    def test_weights_ignore_outliers(self, rng):
        pts, _ = sample_plane(rng, n=256)
        junk = rng.randn(64, 3).astype(np.float32) * 5
        allpts = np.concatenate([pts, junk])
        w = jnp.asarray(np.concatenate([np.ones(256), np.zeros(64)]).astype(np.float32))
        p = fits.fit_plane(jnp.asarray(allpts), w)
        d = pdist.sqdist_plane(jnp.asarray(pts), p.normal, p.offset)
        assert float(jnp.mean(d)) < 1e-6

    def test_grad_finite(self, rng):
        pts, _ = sample_plane(rng, n=128)

        def loss(w):
            p = fits.fit_plane(jnp.asarray(pts), w)
            return jnp.mean(pdist.sqdist_plane(jnp.asarray(pts), p.normal, p.offset))

        g = jax.grad(loss)(jnp.ones(128) * 0.7)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSphere:
    def test_recovery(self, rng):
        pts, _ = sample_sphere(rng, center=(0.2, -0.1, 0.5), radius=0.8)
        s = fits.fit_sphere(jnp.asarray(pts), jnp.ones(pts.shape[0]))
        np.testing.assert_allclose(np.asarray(s.center), [0.2, -0.1, 0.5], atol=2e-3)
        np.testing.assert_allclose(float(s.radius), 0.8, atol=2e-3)

    def test_grad_finite(self, rng):
        pts, _ = sample_sphere(rng, n=128)

        def loss(w):
            s = fits.fit_sphere(jnp.asarray(pts), w)
            return jnp.mean(pdist.sqdist_sphere(jnp.asarray(pts), s.center, s.radius))

        g = jax.grad(loss)(jnp.ones(128) * 0.5)
        assert np.all(np.isfinite(np.asarray(g)))


class TestCylinder:
    def test_recovery(self, rng):
        axis = _unit((0.2, 0.3, 0.9))
        pts, nrm = sample_cylinder(rng, axis=axis, radius=0.5)
        c = fits.fit_cylinder(jnp.asarray(pts), jnp.asarray(nrm),
                              jnp.ones(pts.shape[0]))
        a = np.asarray(c.axis)
        assert abs(abs(a @ axis) - 1) < 1e-3
        np.testing.assert_allclose(float(c.radius), 0.5, atol=5e-3)

    def test_residual_zero(self, rng):
        pts, nrm = sample_cylinder(rng)
        c = fits.fit_cylinder(jnp.asarray(pts), jnp.asarray(nrm),
                              jnp.ones(pts.shape[0]))
        d = pdist.sqdist_cylinder(jnp.asarray(pts), c.axis, c.center, c.radius)
        assert float(jnp.mean(d)) < 1e-4


class TestCone:
    def test_recovery(self, rng):
        pts, nrm = sample_cone(rng, apex=(0.1, -0.2, 0.3), theta=0.5)
        c = fits.fit_cone(jnp.asarray(pts), jnp.asarray(nrm),
                          jnp.ones(pts.shape[0]))
        np.testing.assert_allclose(np.asarray(c.apex), [0.1, -0.2, 0.3], atol=5e-3)
        np.testing.assert_allclose(float(c.theta), 0.5, atol=5e-3)
        a = np.asarray(c.axis)
        assert abs(abs(a @ _unit((0, 0, 1))) - 1) < 1e-3

    def test_residual_zero(self, rng):
        pts, nrm = sample_cone(rng)
        c = fits.fit_cone(jnp.asarray(pts), jnp.asarray(nrm),
                          jnp.ones(pts.shape[0]))
        d = pdist.sqdist_cone(jnp.asarray(pts), c.apex, c.axis, c.theta)
        assert float(jnp.mean(d)) < 1e-4


class TestBatchedDispatch:
    def test_residual_select(self, rng):
        """4 segments of different types share one cloud; each fitted residual
        must be near zero for its own points."""
        clouds, normals, types = [], [], []
        pts_p, nrm_p = sample_plane(rng, n=256)
        pts_s, nrm_s = sample_sphere(rng, n=256)
        pts_c, nrm_c = sample_cylinder(rng, n=256)
        pts_k, nrm_k = sample_cone(rng, n=256)
        allp = np.concatenate([pts_p, pts_s, pts_c, pts_k])
        alln = np.concatenate([nrm_p, nrm_s, nrm_c, nrm_k])
        K, N = 4, 1024
        w = np.zeros((K, N), np.float32)
        for k in range(4):
            w[k, k * 256:(k + 1) * 256] = 1.0
        params = fits.fit_all_primitives_shared_points(
            jnp.asarray(allp), jnp.asarray(alln), jnp.asarray(w))
        geom_type = jnp.asarray([pdist.GEOM_PLANE, pdist.GEOM_SPHERE,
                                 pdist.GEOM_CYLINDER, pdist.GEOM_CONE])
        d = pdist.residual_select(jnp.asarray(allp), params, geom_type)  # [K,N]
        per_seg = np.asarray(jnp.sum(d * w, axis=1) / jnp.sum(w, axis=1))
        assert np.all(per_seg < 1e-3), per_seg

    def test_grad_through_everything(self, rng):
        pts_s, _ = sample_sphere(rng, n=256)
        pts_p, nrm_p = sample_plane(rng, n=256)
        allp = jnp.asarray(np.concatenate([pts_s, pts_p]))
        alln = jnp.asarray(np.concatenate([pts_s * 0 + 1, nrm_p]))

        def loss(logits):
            w = jax.nn.softmax(logits, axis=0)  # soft membership [2, 512]
            params = fits.fit_all_primitives_shared_points(allp, alln, w)
            gt = jnp.asarray([pdist.GEOM_SPHERE, pdist.GEOM_PLANE])
            d = pdist.residual_select(allp, params, gt)
            return jnp.sum(d * w) / jnp.sum(w)

        logits = jnp.asarray(np.random.RandomState(1).randn(2, 512).astype(np.float32))
        val, g = jax.value_and_grad(loss)(logits)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(g)))
