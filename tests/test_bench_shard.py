"""Sharded inference bench mode (bench.py BENCH_SHARD=1) on the CPU mesh.

Asserts the two properties that make the v5e-8 north star directly
measurable instead of extrapolated: (a) the shape batch is actually
placed one-shape-per-device across the 8-device mesh, and (b) the sharded
program computes the SAME metrics as the unsharded one (it is the same
per-shape pipeline; sharding only changes placement).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from parsenet_tpu.data.synthetic import make_shape_batch
from parsenet_tpu.eval.sharded import make_batched_eval
from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
from parsenet_tpu.parallel.mesh import batch_sharding, make_mesh


def _setup(n_pts=512, batch=8):
    model = PrimitivesEmbedding(emb_size=16, num_primitives=10, mode=5, k=4)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, n_pts, 6)))["params"]
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))
    from parsenet_tpu.train.train_e2e import build_spline_fit
    spline_fit = build_spline_fit(grid=10, sample_grid=8)
    host = np.random.RandomState(3)
    pts, labels, normals, prim = make_shape_batch(host, batch, n_pts,
                                                  min_segments=2,
                                                  max_segments=4)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    args = (jnp.asarray(pts.astype(np.float32)),
            jnp.asarray(normals.astype(np.float32)),
            jnp.asarray(labels), jnp.asarray(prim), keys)
    kw = dict(ms_num_samples=n_pts, ms_iterations=5)
    return apply_fn, spline_fit, args, kw


class TestShardedBench:
    def test_placement_and_metric_equality(self):
        assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
        apply_fn, spline_fit, args, kw = _setup()
        mesh = make_mesh()
        bsh = batch_sharding(mesh)

        un = make_batched_eval(apply_fn, spline_fit, **kw)
        ref = np.asarray(un(*args))

        sharded_args = tuple(jax.device_put(a, bsh) for a in args)
        # (a) placement: every device holds exactly one shape of the batch
        for a in sharded_args[:4]:
            shards = a.addressable_shards
            assert len(shards) == 8
            assert sorted(s.data.shape[0] for s in shards) == [1] * 8
            assert len({s.device for s in shards}) == 8
        sh = make_batched_eval(apply_fn, spline_fit, mesh=mesh, **kw)
        out = sh(*sharded_args)
        # (b) output is replicated (fully addressable everywhere)
        assert out.sharding.is_fully_replicated
        got = np.asarray(out)
        # metric sums: identical program, different reduction placement ->
        # tolerance at f32 reduction-order level
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
        # the metrics are non-trivial (not all zeros)
        assert got[1] > 0  # seg_iou sum
        assert np.isfinite(got).all()

    def test_uneven_batch_rejected(self):
        mesh = make_mesh()
        from parsenet_tpu.parallel.mesh import local_batch_size
        try:
            local_batch_size(6, mesh)
            raised = False
        except ValueError:
            raised = True
        assert raised
