"""Full trainer loops over the 8-device mesh (not just single steps)."""
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.core.config import Config
from parsenet_tpu.data.synthetic import make_shape_batch, make_spline_batch


def abc_gen(rng, batch, n):
    while True:
        pts, labels, normals, prim = make_shape_batch(rng, batch, n,
                                                      min_segments=2,
                                                      max_segments=4)
        yield pts.astype(np.float32), labels, normals.astype(np.float32), prim


class TestSegTrainerMesh:
    def test_two_epochs_eight_devices(self, tmp_path):
        from parsenet_tpu.train.train_seg import run_training
        rng = np.random.RandomState(0)
        cfg = Config(model_path="mesh_seg", num_train=16, num_val=8,
                     num_test=8, num_epochs=2, batch_size=8, accum=1,
                     lr=5e-3, mode=5, knn_k=4, num_devices=8,
                     log_dir=str(tmp_path))
        state = run_training(
            cfg, train_gen=abc_gen(rng, 8, 128),
            val_gen=abc_gen(rng, 8, 128), steps_per_epoch=2, val_steps=1,
            points_per_shape=128, num_accum=1)
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert int(state.step) == 4


class TestSplineTrainerMesh:
    def test_one_epoch_eight_devices(self, tmp_path):
        from parsenet_tpu.train.train_spline import run_training
        rng = np.random.RandomState(0)

        def gen():
            while True:
                pts, cps = make_spline_batch(rng, 8, num_points=128, grid=10)
                yield pts, cps, np.ones((8, 3), np.float32), None

        cfg = Config(model_path="mesh_spline", num_train=16, num_epochs=2,
                     batch_size=8, grid_size=10, lr=1e-3, num_devices=8,
                     log_dir=str(tmp_path))
        state = run_training(cfg, train_gen=gen(), val_gen=gen(),
                             steps_per_epoch=2, val_steps=1,
                             anisotropic=False, point_buckets=(128,))
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
