"""Eval-mode spline-segment preprocessing (ops.preprocess) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parsenet_tpu.ops.preprocess import (BUF, draw_fixed, eval_segment_points,
                                         nn_centroid_upsample, pack_segment,
                                         repack, statistical_inliers_packed)


def _packed(rng, n, buf=BUF):
    pts = np.zeros((buf, 3), np.float32)
    pts[:n] = rng.randn(n, 3).astype(np.float32)
    return jnp.asarray(pts), jnp.int32(n)


class TestOutlierRemoval:
    def test_matches_native(self, rng):
        """Masked on-device flags == cpp/outlier.cpp (Open3D semantics)."""
        native = pytest.importorskip("parsenet_tpu.cpp")
        n = 300
        base = rng.randn(n - 6, 3).astype(np.float32) * 0.1
        far = rng.randn(6, 3).astype(np.float32) + 5.0
        cloud = np.concatenate([base, far]).astype(np.float32)
        pts, m = _packed(rng, n)
        pts = pts.at[:n].set(cloud)
        keep = np.asarray(statistical_inliers_packed(pts, m))[:n]
        # native returns the kept points; ours must keep the same set
        kept_native = native.remove_outliers(cloud)
        np.testing.assert_allclose(cloud[keep], kept_native, atol=0)
        # and both match the direct numpy oracle of the Open3D semantics
        d = ((cloud[:, None] - cloud[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        k = min(20, n - 1)
        nearest = np.sort(d, axis=1)[:, :k]
        md = np.sqrt(nearest).mean(1)
        thr = md.mean() + 0.5 * md.std()
        np.testing.assert_array_equal(keep, md <= thr)
        assert keep[-6:].sum() == 0          # the far points are outliers
        assert keep[:-6].mean() > 0.9        # the bulk survives

    def test_tiny_segment_all_kept_when_uniform(self, rng):
        pts, m = _packed(rng, 8)
        keep = np.asarray(statistical_inliers_packed(pts, m))
        assert keep[8:].sum() == 0           # padding never kept
        assert keep[:8].sum() >= 6           # k clamps to m-1, most survive


class TestUpsample:
    def test_one_round_matches_reference_rule(self, rng):
        """One doubling round == append centroid of each point's 4 NNs."""
        n = 40
        pts, m = _packed(rng, n)
        cloud = np.asarray(pts[:n])
        out, new_m = nn_centroid_upsample(pts, m, jnp.int32(2 * n), rounds=1)
        assert int(new_m) == 2 * n
        d = ((cloud[:, None] - cloud[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        nbr = np.argsort(d, axis=1)[:, :4]
        cent = cloud[nbr].mean(1)
        np.testing.assert_allclose(np.asarray(out[n:2 * n]), cent, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[:n]), cloud, atol=0)

    def test_grows_until_target_then_stops(self, rng):
        pts, m = _packed(rng, 120)
        out, new_m = nn_centroid_upsample(pts, m, jnp.int32(1500))
        assert int(new_m) >= 1500
        # already big enough: no growth
        pts2, m2 = _packed(rng, 1700)
        _, m2_out = nn_centroid_upsample(pts2, m2, jnp.int32(1500))
        assert int(m2_out) == 1700

    def test_synthetic_points_stay_local(self, rng):
        """Centroids of neighbours stay inside the segment's bbox."""
        n = 150
        pts, m = _packed(rng, n)
        out, new_m = nn_centroid_upsample(pts, m, jnp.int32(1200))
        cloud = np.asarray(pts[:n])
        grown = np.asarray(out)[:int(new_m)]
        assert grown.min() >= cloud.min() - 1e-5
        assert grown.max() <= cloud.max() + 1e-5


class TestDrawAndPack:
    def test_pack_gathers_members_uniformly(self, rng):
        n = 500
        points = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        member = jnp.asarray(rng.rand(n) < 0.3)
        pts, m = pack_segment(points, member, jax.random.PRNGKey(0))
        assert int(m) == int(np.sum(np.asarray(member)))
        sel = np.asarray(pts[:int(m)])
        pool = np.asarray(points)[np.asarray(member)]
        # every gathered row is a member point, no duplicates
        d = ((sel[:, None] - pool[None]) ** 2).sum(-1)
        assert (d.min(1) < 1e-10).all()
        assert len(np.unique(d.argmin(1))) == int(m)

    def test_draw_without_replacement(self, rng):
        pts, m = _packed(rng, 900)
        out = draw_fixed(pts, m, 600, jax.random.PRNGKey(1))
        uniq = np.unique(np.asarray(out).round(6), axis=0)
        assert uniq.shape[0] == 600
        # wrap mode when m < n_out
        pts2, m2 = _packed(rng, 100)
        out2 = np.asarray(draw_fixed(pts2, m2, 300, jax.random.PRNGKey(2)))
        assert np.unique(out2.round(6), axis=0).shape[0] == 100

    def test_repack(self, rng):
        pts, m = _packed(rng, 10)
        keep = jnp.asarray(np.array([1, 0, 1, 1, 0, 1, 1, 1, 1, 1] +
                                    [0] * (BUF - 10), bool))
        out, new_m = repack(pts, keep)
        assert int(new_m) == 8
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(pts[0]))
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(pts[2]))


class TestEvalSegmentPoints:
    def test_end_to_end(self, rng):
        n = 4000
        points = rng.randn(n, 3).astype(np.float32) * 0.2
        labels = rng.randint(0, 4, size=n)
        member = jnp.asarray(labels == 1)
        out = eval_segment_points(jnp.asarray(points), member,
                                  jnp.int32(1800), jax.random.PRNGKey(0))
        assert out.shape == (1800, 3)
        o = np.asarray(out)
        assert np.isfinite(o).all()
        # all outputs close to the segment's own points
        seg = points[labels == 1]
        d = ((o[:, None] - seg[None]) ** 2).sum(-1).min(1)
        assert d.max() < 0.5

    def test_open_target_1500(self, rng):
        n = 2000
        points = rng.randn(n, 3).astype(np.float32)
        member = jnp.asarray(np.arange(n) < 200)  # 200-point segment
        out = np.asarray(eval_segment_points(
            jnp.asarray(points), member, jnp.int32(1500),
            jax.random.PRNGKey(3)))
        # the first 1500 rows are the decoder's input: distinct points
        uniq = np.unique(out[:1500].round(6), axis=0)
        assert uniq.shape[0] >= 1400   # few dups possible from coincident
                                       # centroids, none from the draw


class TestReferenceUpsampleParity:
    def test_against_reference_up_sample(self, rng):
        torch = pytest.importorskip("torch")
        import os
        if not os.path.isdir("/root/reference/src"):
            pytest.skip("no reference tree")
        from tests.test_reference_parity import install_reference_stubs
        install_reference_stubs()
        import importlib
        fu = importlib.import_module("src.fitting_utils")
        n = 64
        cloud = rng.randn(n, 3).astype(np.float32)
        ref = fu.up_sample_points_torch(torch.from_numpy(cloud), times=1)
        pts, m = _packed(rng, n)
        pts = pts.at[:n].set(cloud)
        out, new_m = nn_centroid_upsample(pts, m, jnp.int32(2 * n), rounds=1)
        np.testing.assert_allclose(np.asarray(out[:2 * n]), ref.numpy(),
                                   atol=1e-5)


class TestOvershootDrawLaw:
    def test_draw_spans_full_doubled_set(self, rng):
        """When NN-centroid doubling overshoots a_max (s=1000 -> m~2000 >
        1800), the final draw must come from the FULL doubled set — the
        reference draws a_max uniformly without replacement from the whole
        up_sample_points output (primitive_forward.py:986-1036). The old
        truncate-to-a_max law kept all originals and only the first
        synthetic rows (deterministically <= a_max - s synthetic); the
        correct hypergeometric law includes ~ a_max * s/m ~ 900 +/- 7.
        Asserting >= 860 separates the laws by many sigma."""
        n, s = 4000, 1000
        points = rng.randn(n, 3).astype(np.float32)
        member = jnp.asarray(np.arange(n) < s)
        out = np.asarray(eval_segment_points(
            jnp.asarray(points), member, jnp.int32(1800),
            jax.random.PRNGKey(7)))[:1800]
        orig = points[:s]
        d = ((out[:, None] - orig[None]) ** 2).sum(-1).min(1)
        synthetic = int((d > 1e-9).sum())
        assert synthetic >= 860, synthetic
