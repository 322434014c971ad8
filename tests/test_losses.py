"""Tests for loss modules against small numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.losses import spline as sl
from parsenet_tpu.losses import embedding as el


class TestPermutationLosses:
    def test_zero_when_permuted(self, rng):
        cp = rng.randn(2, 6, 6, 3).astype(np.float32)
        # prediction equals a flipped+transposed gt -> loss must be 0
        pred = np.swapaxes(cp[:, ::-1, :, :], 1, 2).reshape(2, 36, 3)
        loss, best = sl.control_points_permute_reg_loss(
            jnp.asarray(pred), jnp.asarray(cp), 6)
        assert float(loss) < 1e-10
        np.testing.assert_allclose(np.asarray(best).reshape(2, 36, 3), pred,
                                   atol=1e-6)

    def test_matches_bruteforce(self, rng):
        cp = rng.randn(1, 4, 4, 3).astype(np.float32)
        pred = rng.randn(1, 16, 3).astype(np.float32)
        loss, _ = sl.control_points_permute_reg_loss(
            jnp.asarray(pred), jnp.asarray(cp), 4)
        # brute force all 8 permutations
        p = pred.reshape(4, 4, 3)
        perms = []
        for flip in [(), (0,), (1,), (0, 1)]:
            g = np.flip(cp[0], flip)
            perms.append(((p - g) ** 2).sum())
            perms.append(((p - np.swapaxes(g, 0, 1)) ** 2).sum())
        expect = min(perms) / (4 * 4 * 3)
        np.testing.assert_allclose(float(loss), expect, rtol=1e-5)

    def test_closed_roll_invariance(self, rng):
        cp = rng.randn(2, 5, 5, 3).astype(np.float32)
        pred = np.roll(cp, 3, axis=1).reshape(2, 25, 3)
        loss, _ = sl.control_points_permute_closed_reg_loss(
            jnp.asarray(pred), jnp.asarray(cp), 5)
        assert float(loss) < 1e-10


class TestLaplacian:
    def test_zero_on_equal(self, rng):
        cp = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
        assert float(sl.laplacian_loss(cp, cp)) < 1e-12

    def test_flat_grid_zero_laplacian(self):
        # a linear ramp has zero 5-pt laplacian in the interior
        u = np.linspace(0, 1, 8).astype(np.float32)
        gu, gv = np.meshgrid(u, u, indexing="ij")
        cp = np.stack([gu, gv, np.zeros((8, 8), np.float32)], -1)
        bumped = cp.copy()
        bumped[4, 4, 2] += 1.0
        l = float(sl.laplacian_loss(jnp.asarray(bumped[None]), jnp.asarray(cp[None])))
        assert l > 0


class TestTriplet:
    def test_separated_embeddings_zero_loss(self, rng):
        # two clusters far apart on the sphere: margin satisfied -> ~0 loss
        emb = np.zeros((2, 64, 8), np.float32)
        labels = np.zeros((2, 64), np.int32)
        emb[:, :32, 0] = 1.0
        emb[:, 32:, 1] = 1.0
        labels[:, 32:] = 1
        loss = el.triplet_loss(jnp.asarray(emb), jnp.asarray(labels),
                               jax.random.PRNGKey(0))
        # diff_pos = 0, diff_neg = 2, margin 1 -> relu(0-2+1)=0
        assert float(loss) < 1e-6

    def test_collapsed_embeddings_high_loss(self, rng):
        emb = np.ones((1, 64, 8), np.float32)
        labels = np.zeros((1, 64), np.int32)
        labels[:, 32:] = 1
        loss = el.triplet_loss(jnp.asarray(emb), jnp.asarray(labels),
                               jax.random.PRNGKey(0))
        # identical embeddings: constraint = margin = 1 everywhere
        assert float(loss) > 0.5

    def test_single_segment_excluded(self, rng):
        emb = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
        labels = np.zeros((2, 32), np.int32)
        labels[1, 16:] = 1  # shape 0: single segment, shape 1: two
        loss = el.triplet_loss(emb, jnp.asarray(labels), jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))

    def test_gradient_flows(self, rng):
        emb = jnp.asarray(rng.randn(1, 32, 8).astype(np.float32))
        labels = np.zeros((1, 32), np.int32)
        labels[0, 16:] = 1

        def f(e):
            return el.triplet_loss(e, jnp.asarray(labels), jax.random.PRNGKey(1))

        g = jax.grad(f)(emb)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.sum(jnp.abs(g))) > 0


class TestNLL:
    def test_matches_manual(self, rng):
        logp = jax.nn.log_softmax(jnp.asarray(rng.randn(2, 16, 10).astype(np.float32)))
        gt = jnp.asarray(rng.randint(0, 10, (2, 16)))
        got = float(el.primitive_nll_loss(logp, gt))
        expect = -np.take_along_axis(np.asarray(logp), np.asarray(gt)[..., None],
                                     axis=-1).mean()
        np.testing.assert_allclose(got, expect, rtol=1e-6)


class TestMeanShiftOps:
    def test_three_clusters(self, rng):
        from parsenet_tpu.ops.mean_shift import guard_mean_shift
        emb = np.eye(3, 8)[np.repeat([0, 1, 2], 60)] + 0.02 * rng.randn(180, 8)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        res = guard_mean_shift(jnp.asarray(emb, jnp.float32), 0.05,
                               key=jax.random.PRNGKey(0), num_samples=180,
                               iterations=20)
        assert int(res.num_clusters) == 3
        labels = np.asarray(res.labels)
        gt = np.repeat([0, 1, 2], 60)
        # purity: each predicted cluster maps to one gt cluster
        for c in range(3):
            m = gt[labels == c]
            assert len(m) == 60
            assert np.bincount(m).max() == 60

    def test_gradient_through_shift(self, rng):
        from parsenet_tpu.ops.mean_shift import mean_shift_iterations

        def f(x):
            x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
            out = mean_shift_iterations(x, jnp.float32(0.3), 5)
            return jnp.sum(out ** 2)

        x = jnp.asarray(rng.randn(50, 8).astype(np.float32))
        g = jax.grad(f)(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSIOU:
    def test_perfect_prediction(self, rng):
        from parsenet_tpu.ops.segmentation import siou_matched_segments, to_one_hot
        labels = np.repeat(np.arange(4), 128).astype(np.int32)
        prim = np.repeat([1, 5, 4, 3], 128).astype(np.int32)
        # predicted ids permuted relative to gt
        pred = (labels + 2) % 4
        w = to_one_hot(jnp.asarray(pred))
        siou, piou = siou_matched_segments(
            jnp.asarray(labels), jnp.asarray(pred), jnp.asarray(prim),
            jnp.asarray(prim), w)
        assert abs(float(siou) - 1.0) < 1e-5
        assert abs(float(piou) - 1.0) < 1e-5

    def test_half_overlap(self):
        from parsenet_tpu.ops.segmentation import siou_matched_segments, to_one_hot
        labels = np.repeat([0, 1], 200).astype(np.int32)
        pred = np.repeat([0, 1], 200).astype(np.int32)
        pred[100:200] = 1  # half of gt segment 0 mislabelled
        pred[300:] = 0     # half of gt segment 1 mislabelled
        prim = np.ones(400, np.int32)
        w = to_one_hot(jnp.asarray(pred))
        siou, _ = siou_matched_segments(
            jnp.asarray(labels), jnp.asarray(pred), jnp.asarray(prim),
            jnp.asarray(prim), w)
        # iou of each matched pair = 100/300
        np.testing.assert_allclose(float(siou), 1 / 3, atol=1e-5)
