"""Real-ABC readiness: the h5 schema contract is EXECUTABLE.

When the real ABC h5s land (download_dataset.sh has no egress here), data
day must be a config change, not a debugging session. This file round-trips

    synthetic writer -> reference-schema h5 -> ABCDataset / SplineDataset
    -> one train step + one eval step

and asserts the exact keys/dtypes/shapes the REFERENCE loaders read
(src/dataset_segments.py:38-69 reads points/labels/normals/prim from
{train,val,test}_data.h5; src/dataset.py:50-52 reads points/controlpoints),
emulating the reference's own read pattern so any file the reference can
consume, we can consume — and vice versa.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

N_SHAPES, N_PTS = 10, 256
N_SPLINES, N_SP_PTS, GRID = 12, 100, 20


@pytest.fixture(scope="module")
def abc_dir(tmp_path_factory):
    from parsenet_tpu.data.synthetic import write_abc_h5, write_spline_h5
    root = tmp_path_factory.mktemp("abc_schema")
    (root / "shapes").mkdir()
    (root / "spline").mkdir()
    for split, seed in (("train", 0), ("val", 1), ("test", 2)):
        write_abc_h5(str(root / "shapes" / f"{split}_data.h5"), N_SHAPES,
                     num_points=N_PTS, seed=seed)
    write_spline_h5(str(root / "spline" / "open_splines.h5"), N_SPLINES,
                    num_points=N_SP_PTS, grid=GRID, seed=3)
    write_spline_h5(str(root / "spline" / "closed_splines.h5"), N_SPLINES,
                    num_points=N_SP_PTS, grid=GRID, closed=True, seed=4)
    return root


class TestSegmentSchema:
    def test_reference_read_pattern(self, abc_dir):
        """Emulate src/dataset_segments.py:38-69 exactly: hf.get() by key,
        then slice + astype(float32). Keys, ranks, and value domains."""
        for split in ("train", "val", "test"):
            with h5py.File(abc_dir / "shapes" / f"{split}_data.h5", "r") as hf:
                assert set(hf.keys()) >= {"points", "labels", "normals",
                                          "prim"}
                points = np.array(hf.get("points"))
                labels = np.array(hf.get("labels"))
                normals = np.array(hf.get("normals"))
                prim = np.array(hf.get("prim"))
            assert points.shape == (N_SHAPES, N_PTS, 3)
            assert normals.shape == (N_SHAPES, N_PTS, 3)
            assert labels.shape == prim.shape == (N_SHAPES, N_PTS)
            # reference astypes points/normals to f32 and indexes with
            # labels/prim as integers
            assert np.issubdtype(points.dtype, np.floating)
            assert np.issubdtype(normals.dtype, np.floating)
            assert np.issubdtype(labels.dtype, np.integer)
            assert np.issubdtype(prim.dtype, np.integer)
            # taxonomy: 10 primitive classes (readme_data.md:36-47)
            assert prim.min() >= 0 and prim.max() <= 9
            assert labels.min() >= 0
            # unit-ish normals
            nn = np.linalg.norm(normals, axis=-1)
            assert np.allclose(nn, 1.0, atol=1e-3)

    def test_abcdataset_loads_and_iterates(self, abc_dir):
        from parsenet_tpu.data.abc import ABCDataset
        ds = ABCDataset(4, path_prefix=str(abc_dir / "shapes") + "/",
                        train_size=N_SHAPES, val_size=N_SHAPES,
                        test_size=N_SHAPES, normals=True, primitives=True)
        pts, labels, nrm, prim = next(ds.get_train())
        assert pts.shape == (4, N_PTS, 3) and pts.dtype == np.float32
        assert nrm.shape == (4, N_PTS, 3)
        assert labels.shape == prim.shape == (4, N_PTS)
        # test split: eval canonicalization applied, finite
        tpts, tl, tn, tp = next(iter(ds.get_test()))
        assert np.isfinite(tpts).all()

    def test_one_train_and_eval_step(self, abc_dir):
        """The full contract: h5 -> loader -> one seg train step -> one
        predict_segmentation eval step, all finite."""
        from parsenet_tpu.data.abc import ABCDataset
        from parsenet_tpu.eval.pipeline import predict_segmentation
        from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
        from parsenet_tpu.train.state import create_state
        from parsenet_tpu.train.train_seg import make_step_fns
        ds = ABCDataset(2, path_prefix=str(abc_dir / "shapes") + "/",
                        train_size=N_SHAPES, val_size=N_SHAPES,
                        test_size=N_SHAPES)
        model = PrimitivesEmbedding(emb_size=16, num_primitives=10, mode=5,
                                    k=4)
        state = create_state(model, jax.random.PRNGKey(0),
                             (jnp.zeros((2, N_PTS, 6)),))
        step, _ = make_step_fns(model)
        pts, labels, nrm, prim = next(ds.get_train())
        x = np.concatenate([pts, nrm], -1).astype(np.float32)
        state, metrics = step(state, jnp.asarray(x[None]),
                              jnp.asarray(labels[None]),
                              jnp.asarray(prim[None]), jax.random.PRNGKey(1),
                              jnp.float32(1e-3))
        assert np.isfinite(float(metrics["embed_loss"]))
        assert float(metrics["grad_ok"]) == 1.0
        # eval step on a test shape
        tpts, tl, tn, tp = next(iter(ds.get_test()))
        apply_fn = jax.jit(
            lambda xx: model.apply({"params": state.params}, xx))
        xin = jnp.asarray(
            np.concatenate([tpts[0], tn[0]], -1).astype(np.float32))
        pred = predict_segmentation(apply_fn, xin, jnp.asarray(tl[0]),
                                    jnp.asarray(tp[0]),
                                    jax.random.PRNGKey(2),
                                    ms_num_samples=N_PTS, iterations=5)
        assert 0.0 <= float(pred.seg_iou) <= 1.0
        assert int(pred.num_clusters) >= 1


class TestSplineSchema:
    def test_reference_read_pattern(self, abc_dir):
        """src/dataset.py:50-52: points/controlpoints, control grid is
        [M, size_u, size_v, 3] with size_u = size_v = 20."""
        for name in ("open_splines.h5", "closed_splines.h5"):
            with h5py.File(abc_dir / "spline" / name, "r") as hf:
                assert set(hf.keys()) >= {"points", "controlpoints"}
                points = np.array(hf.get(name="points")).astype(np.float32)
                cps = np.array(hf.get(name="controlpoints")).astype(
                    np.float32)
            assert points.shape == (N_SPLINES, N_SP_PTS, 3)
            assert cps.shape == (N_SPLINES, GRID, GRID, 3)
            assert np.isfinite(points).all() and np.isfinite(cps).all()

    def test_spline_loader_and_step(self, abc_dir):
        from parsenet_tpu.data.splines import SplineDataset
        ds = SplineDataset(str(abc_dir / "spline" / "open_splines.h5"),
                           batch_size=4, grid=GRID,
                           splits=(8, 2))
        batch = next(ds.load_train_data(align_canonical=True,
                                        anisotropic=True))
        pts, cps, scales = batch[0], batch[1], batch[2]
        assert pts.shape == (4, N_SP_PTS, 3)
        assert cps.shape == (4, GRID, GRID, 3)
        assert scales.shape == (4, 3)  # anisotropic per-axis scales
        assert np.isfinite(pts).all() and np.isfinite(cps).all()
