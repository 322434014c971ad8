"""Numerical parity against the PyTorch reference implementation.

These tests import the actual reference modules from /root/reference/src
(public untrusted content — we execute only the numerical functions under
test, with open3d/lapsolver/geomdl stubbed out) and assert same-input
agreement with the parsenet_tpu ops:

* mean-shift: bandwidth, shift iterations, NMS (incl. the ambiguous
  chained-center regime), full guarded pipeline   (src/mean_shift.py)
* triplet embedding loss: deterministic two-segment case exactly, and the
  stochastic estimator in expectation             (src/segment_loss.py)
* SIOU matched segments + mIoU                    (src/segment_utils.py)
* B-spline basis matrices nu/nv to 1e-6           (src/loss.py:190-210)
* permutation / reconstruction / laplacian losses (src/loss.py)
* chamfer distances                               (src/utils.py)
* dilated kNN + joint point/normal metric         (src/PointNet.py)

Skipped wholesale if torch or the reference tree is unavailable.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "src")),
    reason="reference tree not mounted")


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_reference_stubs():
    """Stub the reference's native deps and make torch .cuda() a no-op so the
    reference modules import on this CPU-only host. Shared with
    test_preprocess.py."""
    from scipy.optimize import linear_sum_assignment

    def solve_dense(cost):
        return linear_sum_assignment(np.asarray(cost))

    _stub_module("lapsolver", solve_dense=solve_dense)
    _stub_module("lap")
    _stub_module("trimesh")
    t3d = _stub_module("transforms3d")
    t3d.__path__ = []
    t3d.affines = _stub_module("transforms3d.affines", compose=None)
    t3d.euler = _stub_module("transforms3d.euler", euler2mat=None)
    # src/utils.py does `from open3d import *` then touches utility/
    # visualization members at import time
    _stub_module("open3d",
                 utility=types.SimpleNamespace(Vector3dVector=None,
                                               Vector3iVector=None),
                 visualization=types.SimpleNamespace(draw_geometries=None))
    geomdl = _stub_module("geomdl", BSpline=object, NURBS=object,
                          fitting=None, multi=None)
    geomdl.__path__ = []  # let `from geomdl.X import ...` hit sys.modules
    geomdl.visualization = _stub_module("geomdl.visualization", VisMPL=None)
    geomdl.tessellate = _stub_module("geomdl.tessellate",
                                     make_triangle_mesh=None)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.get_device = lambda t: 0
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with CPU-safe torch and stubbed deps."""
    install_reference_stubs()
    import importlib
    ns = types.SimpleNamespace()
    ns.mean_shift = importlib.import_module("src.mean_shift")
    ns.segment_loss = importlib.import_module("src.segment_loss")
    ns.segment_utils = importlib.import_module("src.segment_utils")
    ns.loss = importlib.import_module("src.loss")
    ns.PointNet = importlib.import_module("src.PointNet")
    ns.utils = importlib.import_module("src.utils")
    return ns


def _unit_rows(rng, n, d):
    x = rng.randn(n, d).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered_embedding(rng, sizes, d=8, noise=0.03):
    """Unit-norm embedding with len(sizes) well-separated clusters."""
    centers = _unit_rows(rng, len(sizes), d)
    rows, labels = [], []
    for i, s in enumerate(sizes):
        pts = centers[i][None] + noise * rng.randn(s, d).astype(np.float32)
        rows.append(pts)
        labels.append(np.full(s, i))
    x = np.concatenate(rows)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32), np.concatenate(labels).astype(np.int32)


# --------------------------------------------------------------------------
# mean shift
# --------------------------------------------------------------------------

class TestMeanShiftParity:
    def test_bandwidth(self, ref, rng):
        from parsenet_tpu.ops.mean_shift import (_sorted_subset_sqdist,
                                                 bandwidth_from_sorted)
        import jax.numpy as jnp
        x, _ = _clustered_embedding(rng, [40, 40, 40])
        n = x.shape[0]
        # num_samples = N: the reference's random subset is then a permutation
        # of all rows and the row-mean is permutation invariant
        ms = ref.mean_shift.MeanShift()
        bw_ref = ms.compute_bandwidth(torch.from_numpy(x), n, 0.05)
        sorted_d = _sorted_subset_sqdist(jnp.asarray(x), None, n)
        bw_jax = bandwidth_from_sorted(sorted_d, jnp.float32(0.05))
        assert abs(float(bw_ref) - float(bw_jax)) < 1e-5

    def test_shift_iterations(self, ref, rng):
        from parsenet_tpu.ops.mean_shift import mean_shift_iterations
        import jax.numpy as jnp
        x, _ = _clustered_embedding(rng, [30, 50, 20])
        for bw in (0.3, 0.8):
            out_ref, _ = ref.mean_shift.MeanShift().mean_shift_(
                torch.from_numpy(x), b=torch.tensor(bw), iterations=10)
            out_jax = mean_shift_iterations(jnp.asarray(x), jnp.float32(bw), 10)
            np.testing.assert_allclose(np.asarray(out_jax),
                                       out_ref.numpy(), atol=2e-4)

    def _nms_both(self, ref, centers, x, bw):
        import jax.numpy as jnp
        from parsenet_tpu.ops.mean_shift import nms
        _, ids_ref, labels_ref = ref.mean_shift.MeanShift().nms(
            torch.from_numpy(centers), torch.from_numpy(x), torch.tensor(bw))
        mask, labels, k = nms(jnp.asarray(centers), jnp.asarray(x),
                              jnp.float32(bw))
        ids = np.where(np.asarray(mask) > 0)[0]
        return (np.sort(ids_ref.numpy()), labels_ref.numpy(),
                np.sort(ids), np.asarray(labels), int(k))

    def test_nms_separated(self, ref, rng):
        x, _ = _clustered_embedding(rng, [30, 40, 20], noise=0.01)
        # converged centers: every point sits exactly on its cluster mean
        from parsenet_tpu.ops.mean_shift import mean_shift_iterations
        import jax.numpy as jnp
        centers = np.asarray(mean_shift_iterations(jnp.asarray(x),
                                                   jnp.float32(0.2), 20))
        ids_ref, lab_ref, ids, lab, k = self._nms_both(ref, centers, x, 0.3)
        np.testing.assert_array_equal(ids_ref, ids)
        np.testing.assert_array_equal(lab_ref, lab)
        assert k == 3

    def test_nms_chained_centers(self, ref):
        """A near B, B near C, C not near A: the ambiguous suppression regime
        flagged in round 1 (reference mean_shift.py:160-173)."""
        d = 4
        # three center directions on the sphere with controlled gaps, with
        # distinct member counts so the winner-argmax is unambiguous
        def on_sphere(theta):
            v = np.zeros(d, np.float32)
            v[0], v[1] = np.cos(theta), np.sin(theta)
            return v

        # sq-dist between unit vecs = 2-2cos(dtheta); bandwidth threshold is
        # dist < b. pick thetas so AB, BC < b but AC > b.
        b = 0.30
        thA, thB, thC = 0.0, 0.45, 0.9    # AB=BC=2-2cos(.45)=.200<b; AC=.61>b
        sizes = [5, 9, 7]
        centers, xs = [], []
        for th, s in zip((thA, thB, thC), sizes):
            c = on_sphere(th)
            centers += [c] * s
            xs += [on_sphere(th + 0.01 * (i - s / 2)) for i in range(s)]
        centers = np.stack(centers)
        x = np.stack(xs)
        ids_ref, lab_ref, ids, lab, k = self._nms_both(ref, centers, x, b)
        np.testing.assert_array_equal(ids_ref, ids)
        np.testing.assert_array_equal(lab_ref, lab)

    def test_nms_fuzz(self, ref, rng):
        """Randomized agreement across bandwidths (generic positions, so no
        exact count ties between mutually-near centers)."""
        mismatches = 0
        for t in range(10):
            x, _ = _clustered_embedding(rng, [17, 23, 11, 7],
                                        noise=0.05 + 0.05 * (t % 3))
            from parsenet_tpu.ops.mean_shift import mean_shift_iterations
            import jax.numpy as jnp
            centers = np.asarray(mean_shift_iterations(
                jnp.asarray(x), jnp.float32(0.25), 10))
            ids_ref, lab_ref, ids, lab, _ = self._nms_both(
                ref, centers, x, 0.2 + 0.1 * (t % 4))
            if not (len(ids_ref) == len(ids) and np.array_equal(ids_ref, ids)):
                mismatches += 1
                continue
            mismatches += int(np.mean(lab_ref != lab) > 1e-3)
        assert mismatches == 0

    def test_guarded_pipeline_labels(self, ref, rng):
        """Full mean_shift(num_samples=N) + NMS clustering: identical labels
        on clean clustered embeddings."""
        from parsenet_tpu.ops.mean_shift import guard_mean_shift
        import jax
        x, _ = _clustered_embedding(rng, [60, 80, 50], noise=0.02)
        out = ref.mean_shift.MeanShift().mean_shift(
            torch.from_numpy(x), x.shape[0], 0.05, 10)
        _, _, _, lab_ref = out
        res = guard_mean_shift(jax.numpy.asarray(x), 0.05,
                               num_samples=x.shape[0], iterations=10)
        np.testing.assert_array_equal(lab_ref.numpy(), np.asarray(res.labels))


# --------------------------------------------------------------------------
# triplet loss
# --------------------------------------------------------------------------

class TestTripletParity:
    def test_two_segment_deterministic(self, ref):
        """Constant embedding per segment -> the estimator is deterministic
        (every sampled point is the same vector) and must agree exactly."""
        import jax
        from parsenet_tpu.losses.embedding import triplet_loss
        N = 64
        e1 = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
        e2 = np.array([0.9, 0.1, 0.0, 0.0], np.float32)
        emb = np.stack([e1] * (N // 2) + [e2] * (N // 2))  # [N, 4]
        labels = np.array([0] * (N // 2) + [1] * (N // 2))

        np.random.seed(3)  # the reference samples with global numpy RNG
        loss_fn = ref.segment_loss.EmbeddingLoss(margin=1.0)
        out = torch.from_numpy(emb.T[None])  # B x D x N
        ref_val = float(loss_fn.triplet_loss(out, labels[None]))

        ours = float(triplet_loss(jax.numpy.asarray(emb[None]),
                                  jax.numpy.asarray(labels[None]),
                                  jax.random.PRNGKey(0)))
        assert ref_val > 0.01
        assert abs(ref_val - ours) < 1e-5

    def test_three_segment_expectation(self, ref):
        """Unequal pairwise distances: both estimators sample ordered segment
        pairs uniformly, so their expectations agree."""
        import jax
        from parsenet_tpu.losses.embedding import triplet_loss
        vs = np.array([[1, 0, 0, 0], [0.92, 0.39, 0, 0], [0.7, 0.7, 0.14, 0]],
                      np.float32)
        vs /= np.linalg.norm(vs, axis=1, keepdims=True)
        sizes = [30, 20, 14]
        emb = np.concatenate([np.tile(v, (s, 1)) for v, s in zip(vs, sizes)])
        labels = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])

        loss_fn = ref.segment_loss.EmbeddingLoss(margin=1.0)
        out = torch.from_numpy(emb.T[None].copy())
        np.random.seed(11)
        ref_vals = [float(loss_fn.triplet_loss(out, labels[None]))
                    for _ in range(300)]

        t_loss = jax.jit(lambda k: triplet_loss(
            jax.numpy.asarray(emb[None]), jax.numpy.asarray(labels[None]), k))
        keys = jax.random.split(jax.random.PRNGKey(7), 300)
        ours_vals = [float(t_loss(k)) for k in keys]

        m_ref, m_ours = np.mean(ref_vals), np.mean(ours_vals)
        se = np.hypot(np.std(ref_vals) / np.sqrt(len(ref_vals)),
                      np.std(ours_vals) / np.sqrt(len(ours_vals)))
        assert abs(m_ref - m_ours) < max(4 * se, 1e-4), (m_ref, m_ours, se)

    def test_miou(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.ops.segmentation import mean_iou_per_class
        gt = rng.randint(0, 10, size=(2, 500))
        logits = rng.randn(2, 500, 10).astype(np.float32)
        ref_val = ref.segment_loss.evaluate_miou(gt, logits)
        ours = float(mean_iou_per_class(jnp.asarray(gt), jnp.asarray(logits)))
        assert abs(float(ref_val) - ours) < 1e-5


# --------------------------------------------------------------------------
# SIOU
# --------------------------------------------------------------------------

class TestSIOUParity:
    def _case(self, rng, n=3000, segs=8):
        gt = rng.randint(0, segs, size=n)
        gt[:40] = segs  # one tiny GT segment (<100 pts, must be skipped)
        pred = gt.copy()
        flip = rng.rand(n) < 0.12
        pred[flip] = rng.randint(0, segs + 1, size=int(flip.sum()))
        # per-GT-segment consistent primitive types incl. remapped ids
        seg_types = rng.choice([0, 1, 3, 4, 5, 6, 7, 8, 9], size=segs + 1)
        gt_prim = seg_types[gt]
        pred_prim = seg_types[pred]
        noise = rng.rand(n) < 0.05
        pred_prim[noise] = rng.randint(0, 10, size=int(noise.sum()))
        return gt, pred, pred_prim, gt_prim

    def test_siou_matched_segments(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.ops.segmentation import (siou_matched_segments,
                                                   to_one_hot)
        for _ in range(3):
            gt, pred, pred_prim, gt_prim = self._case(rng)
            weights_np = np.eye(50, dtype=np.float32)[pred]  # [N, K] one-hot
            s_ref, p_ref, _, _ = ref.segment_utils.SIOU_matched_segments(
                gt.copy(), pred.copy(), pred_prim.copy(), gt_prim.copy(),
                torch.from_numpy(weights_np))
            s, p = siou_matched_segments(
                jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(pred_prim),
                jnp.asarray(gt_prim), to_one_hot(jnp.asarray(pred)))
            assert abs(float(s_ref) - float(s)) < 1e-5, (s_ref, float(s))
            assert abs(float(p_ref) - float(p)) < 1e-5, (p_ref, float(p))

    def test_relaxed_iou(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.ops.segmentation import relaxed_iou
        a = (rng.rand(400, 50) > 0.7).astype(np.float32)
        b = (rng.rand(400, 50) > 0.7).astype(np.float32)
        cost_ref = ref.segment_utils.relaxed_iou_fast(
            torch.from_numpy(a[None]), torch.from_numpy(b[None]))[0].numpy()
        ours = np.asarray(relaxed_iou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(ours, cost_ref, atol=1e-5)


# --------------------------------------------------------------------------
# spline basis + losses
# --------------------------------------------------------------------------

class TestSplineParity:
    @pytest.mark.parametrize("cu,cv,du,dv,g", [(20, 20, 3, 3, 30),
                                               (21, 20, 3, 3, 40),
                                               (10, 10, 2, 2, 16)])
    def test_basis_matrices(self, ref, cu, cv, du, dv, g):
        from parsenet_tpu.ops.bspline import uniform_knot_bspline
        nu_ref, nv_ref = ref.loss.uniform_knot_bspline(cu, cv, du, dv, g)
        nu, nv = uniform_knot_bspline(cu, cv, du, dv, g)
        np.testing.assert_allclose(nu, nu_ref, atol=1e-6)
        np.testing.assert_allclose(nv, nv_ref, atol=1e-6)

    def test_permute_reg_loss(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.losses.spline import control_points_permute_reg_loss
        B, G = 4, 6
        out = rng.randn(B, G * G, 3).astype(np.float32)
        cp = rng.randn(B, G, G, 3).astype(np.float32)
        l_ref, best_ref = ref.loss.control_points_permute_reg_loss(
            torch.from_numpy(out), torch.from_numpy(cp), G)
        l, best = control_points_permute_reg_loss(jnp.asarray(out),
                                                  jnp.asarray(cp), G)
        assert abs(float(l_ref) - float(l)) < 1e-5
        np.testing.assert_allclose(np.asarray(best), best_ref.numpy(),
                                   atol=1e-6)

    def test_permute_closed_reg_loss(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.losses.spline import \
            control_points_permute_closed_reg_loss
        B, G = 3, 5
        out = rng.randn(B, G * G, 3).astype(np.float32)
        cp = rng.randn(B, G, G, 3).astype(np.float32)
        l_ref, _ = ref.loss.control_points_permute_closed_reg_loss(
            torch.from_numpy(out), torch.from_numpy(cp), G, G)
        l, _ = control_points_permute_closed_reg_loss(jnp.asarray(out),
                                                      jnp.asarray(cp), G)
        assert abs(float(l_ref) - float(l)) < 1e-5

    def test_laplacian_loss(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.losses.spline import laplacian_loss
        B, G = 3, 10
        out = rng.randn(B, G, G, 3).astype(np.float32)
        gt = rng.randn(B, G, G, 3).astype(np.float32)
        l_ref = ref.loss.laplacian_loss(torch.from_numpy(out),
                                        torch.from_numpy(gt))
        l = laplacian_loss(jnp.asarray(out), jnp.asarray(gt))
        assert abs(float(l_ref) - float(l)) < 1e-4

    def test_reconstruction_losses(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.losses.spline import (
            spline_reconstruction_loss, spline_reconstruction_loss_one_sided)
        from parsenet_tpu.ops.bspline import uniform_knot_bspline
        B, G, N = 2, 8, 120
        nu, nv = uniform_knot_bspline(G, G, 3, 3, 20)
        out = rng.randn(B, G * G, 3).astype(np.float32)
        pts = rng.randn(B, N, 3).astype(np.float32)
        cfg = types.SimpleNamespace(batch_size=B, grid_size=G)
        t_nu, t_nv = torch.from_numpy(nu), torch.from_numpy(nv)
        t_out = torch.from_numpy(out.reshape(B, G, G, 3))
        t_pts = torch.from_numpy(np.transpose(pts, (0, 2, 1)))
        l2_ref, rec_ref = ref.loss.spline_reconstruction_loss(
            t_nu, t_nv, t_out, t_pts, cfg)
        l1_ref, _ = ref.loss.spline_reconstruction_loss_one_sided(
            t_nu, t_nv, t_out, t_pts, cfg)
        l2, rec = spline_reconstruction_loss(jnp.asarray(nu), jnp.asarray(nv),
                                             jnp.asarray(out), jnp.asarray(pts))
        l1, _ = spline_reconstruction_loss_one_sided(
            jnp.asarray(nu), jnp.asarray(nv), jnp.asarray(out),
            jnp.asarray(pts))
        assert abs(float(l2_ref) - float(l2)) < 1e-5
        assert abs(float(l1_ref) - float(l1)) < 1e-5
        np.testing.assert_allclose(np.asarray(rec), rec_ref.numpy(), atol=1e-4)

    def test_chamfer(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.ops.chamfer import (chamfer_distance,
                                              chamfer_distance_one_side)
        a = rng.randn(2, 100, 3).astype(np.float32)
        b = rng.randn(2, 140, 3).astype(np.float32)
        for sqrt in (False, True):
            r = ref.utils.chamfer_distance(torch.from_numpy(a),
                                           torch.from_numpy(b), sqrt=sqrt)
            o = chamfer_distance(jnp.asarray(a), jnp.asarray(b), sqrt=sqrt)
            assert abs(float(r) - float(o)) < 1e-5
        for side in (0, 1):
            r = ref.utils.chamfer_distance_one_side(torch.from_numpy(a),
                                                    torch.from_numpy(b),
                                                    side=side)
            o = chamfer_distance_one_side(jnp.asarray(a), jnp.asarray(b),
                                          side=side)
            assert abs(float(r) - float(o)) < 1e-5


# --------------------------------------------------------------------------
# kNN
# --------------------------------------------------------------------------

class TestKnnParity:
    def test_knn_dilated(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.ops.knn import knn
        x = rng.randn(2, 3, 64).astype(np.float32)  # reference layout B x C x N
        for k1, k2 in ((8, 8), (5, 10), (4, 16)):
            idx_ref = ref.PointNet.knn(torch.from_numpy(x), k1, k2).numpy()
            ours = np.asarray(knn(jnp.asarray(np.transpose(x, (0, 2, 1))),
                                  k1, k2, exact=True))
            assert ours.shape[-1] == k1
            np.testing.assert_array_equal(np.sort(ours, -1),
                                          np.sort(idx_ref[..., :k1], -1))

    def test_knn_points_normals(self, ref, rng):
        import jax.numpy as jnp
        from parsenet_tpu.ops.knn import knn_points_normals
        p = rng.randn(1, 3, 80).astype(np.float32)
        n = rng.randn(1, 3, 80).astype(np.float32)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        x = np.concatenate([p, n], 1)
        idx_ref = ref.PointNet.knn_points_normals(
            torch.from_numpy(x), 6, 12).numpy()
        ours = np.asarray(knn_points_normals(
            jnp.asarray(np.transpose(x, (0, 2, 1))), 6, 12, exact=True))
        np.testing.assert_array_equal(np.sort(ours, -1),
                                      np.sort(idx_ref[..., :6], -1))
