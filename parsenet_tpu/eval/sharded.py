"""Batch-sharded inference over a device mesh.

The north star is defined on a v5e-8 (BASELINE.md: 10k shapes/hour on 8
chips). bench.py measures one chip; this module makes the SAME per-shape
program (segmentation forward -> mean-shift -> fits -> residual/coverage
metrics, eval/pipeline.py) runnable N-way data-parallel over a
`jax.sharding.Mesh`: the shape batch is sharded over the "data" axis,
parameters are replicated, and the metric sums come back as replicated
scalars (XLA inserts the cross-device reduction). No reference analog —
the reference's eval is a single-GPU Python loop (test.py:108).

Used by bench.py (BENCH_SHARD=1) and tested for metric equality with the
unsharded path on an 8-device CPU mesh (tests/test_bench_shard.py), so the
v5e-8 configuration is directly measurable the day multi-chip hardware
appears.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..parallel.mesh import batch_sharding, replicated
from .pipeline import predict_segmentation, reconstruct_shape


def make_shape_pipeline(apply_fn: Callable, spline_fit: Optional[Callable],
                        ms_bf16: bool = False, ms_num_samples: int = 5000,
                        ms_iterations: int = 50,
                        eval_preprocess: bool = True) -> Callable:
    """Per-shape inference pipeline (one jittable function): returns
    (SegmentationPrediction, Reconstruction) for points/normals [N, 3],
    gt labels/prim [N], and a PRNG key."""

    def shape_pipeline(p, n, lab, pr, key):
        x = jnp.concatenate([p, n], axis=-1)
        k1, k2 = jax.random.split(key)
        pred = predict_segmentation(apply_fn, x, lab, pr, k1,
                                    ms_bf16=ms_bf16,
                                    ms_num_samples=ms_num_samples,
                                    iterations=ms_iterations)
        rec = reconstruct_shape(p, n, pred.labels, pred.pred_prim, k2,
                                spline_fit=spline_fit,
                                eval_preprocess=eval_preprocess)
        return pred, rec

    return shape_pipeline


def make_batched_eval(apply_fn: Callable, spline_fit: Optional[Callable],
                      mesh=None, **pipeline_kw) -> Callable:
    """Jitted batched metric program: (pts, normals, labels, prim, keys)
    -> [4] sums of (residual, seg_iou, p_cov, sk_2) over the batch.

    mesh=None: single-device (the jit runs wherever the inputs live).
    mesh: the batch axis of every input is sharded over the mesh's "data"
    axis; outputs are replicated scalars. The per-shape program is
    identical — sharding only changes placement.
    """
    shape_pipeline = make_shape_pipeline(apply_fn, spline_fit, **pipeline_kw)

    def batch_metrics(p, n, lab, pr, keys):
        pred, rec = jax.vmap(shape_pipeline)(p, n, lab, pr, keys)
        return jnp.stack([jnp.sum(rec.residual), jnp.sum(pred.seg_iou),
                          jnp.sum(rec.p_cov), jnp.sum(rec.sk_2)])

    if mesh is None:
        return jax.jit(batch_metrics)
    bsh = batch_sharding(mesh)
    return jax.jit(batch_metrics, in_shardings=(bsh,) * 5,
                   out_shardings=replicated(mesh))
