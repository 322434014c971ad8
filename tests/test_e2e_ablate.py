"""In-context ablation arms of the e2e train step (scripts/bench_train.py).

The ablate knob exists so stage costs can be measured INSIDE the jitted
step on the tunneled TPU runtime; these tests pin its semantics at tiny
scale so a timing sweep can't silently measure a broken graph:
  - every arm compiles, runs, and yields finite losses with grad_ok
  - "fit" zeroes the fitting loss exactly
  - "ms" (GT-cluster stub) produces near-perfect segmentation IoU
  - ablate=() is the production path (same step function object semantics)
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parsenet_tpu.data.synthetic import make_shape_batch
from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
from parsenet_tpu.train.state import create_state
from parsenet_tpu.train.train_e2e import build_spline_fit, make_e2e_step

N_PTS = 256


def _setup(ablate=(), splines=True):
    model = PrimitivesEmbedding(emb_size=16, num_primitives=10, mode=5, k=4)
    state = create_state(model, jax.random.PRNGKey(0),
                         (jnp.zeros((1, N_PTS, 6)),))
    spline_fit = build_spline_fit(grid=10, sample_grid=8) if splines else None
    step, eval_step = make_e2e_step(model, spline_fit, iterations=5,
                                    ms_num_samples=N_PTS, ablate=ablate)
    host = np.random.RandomState(0)
    pts, labels, normals, prim = make_shape_batch(host, 1, N_PTS,
                                                  min_segments=2,
                                                  max_segments=4)
    x = jnp.asarray(np.concatenate([pts, normals], -1).astype(np.float32))
    return state, step, eval_step, x, jnp.asarray(labels), jnp.asarray(prim)


@pytest.mark.parametrize("ablate", [(), ("netgrad",), ("ms",), ("match",),
                                    ("fits",)])
def test_arm_runs_finite(ablate):
    state, step, _, x, lb, pb = _setup(ablate)
    state, m = step(state, x, lb, pb, jax.random.PRNGKey(1),
                    jnp.float32(1e-4))
    for k in ("res_loss", "embed_loss", "prim_loss"):
        assert np.isfinite(float(m[k])), (ablate, k, m[k])
    assert float(m["grad_ok"]) == 1.0


def test_fit_arm_zeroes_fitting_loss():
    state, step, _, x, lb, pb = _setup(("fit",))
    _, m = step(state, x, lb, pb, jax.random.PRNGKey(1), jnp.float32(1e-4))
    assert float(m["res_loss"]) == 0.0
    assert float(m["geom_loss"]) == 0.0
    assert float(m["grad_ok"]) == 1.0


def test_ms_stub_uses_gt_clusters():
    state, _, eval_step, x, lb, pb = _setup(("ms",))
    m = eval_step(state, x, lb, pb, jax.random.PRNGKey(1))
    # clusters ARE the GT segments, so matched segmentation IoU ~ 1
    assert float(m["seg_iou"]) > 0.95, float(m["seg_iou"])
    assert int(m["clusters"]) == len(np.unique(np.asarray(lb)))


def test_splines_off_runs():
    state, step, _, x, lb, pb = _setup((), splines=False)
    _, m = step(state, x, lb, pb, jax.random.PRNGKey(1), jnp.float32(1e-4))
    assert np.isfinite(float(m["res_loss"]))
    assert float(m["spline_loss"]) == 0.0
