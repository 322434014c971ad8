"""Training-step throughput on the real chip.

Times the segmentation train step (triplet + NLL, grad accumulation) and the
full e2e step (network -> mean-shift -> matching -> fits -> spline decoders
-> residual -> grads) at reference scales. Prints one JSON line per bench.

Usage: python scripts/bench_train.py [seg|e2e|all]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# A/B knobs (env): BT_BATCH / BT_ACCUM / BT_POINTS scale the step;
# BT_BF16=1 runs the network compute in bf16 with bf16 neighbour gathers
# (params and GroupNorm statistics stay f32); BT_REMAT=1 rematerializes
# EdgeConvs in the backward pass (memory for recompute at large batches).
_BF16 = os.environ.get("BT_BF16", "0") == "1"
_REMAT = os.environ.get("BT_REMAT", "0") == "1"


def _model_kw():
    import jax.numpy as jnp
    kw = {}
    if _BF16:
        kw.update(dtype=jnp.bfloat16, gather_bf16=True)
    if _REMAT:
        kw.update(remat=True)
    return kw


def bench_seg(batch=2, n_points=7000, accum=3, steps=5):
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.train.state import create_state
    from parsenet_tpu.train.train_seg import make_step_fns

    batch = int(os.environ.get("BT_BATCH", batch))
    accum = int(os.environ.get("BT_ACCUM", accum))
    n_points = int(os.environ.get("BT_POINTS", n_points))
    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80,
                                **_model_kw())
    state = create_state(model, jax.random.PRNGKey(0),
                         (jnp.zeros((batch, n_points, 6)),))
    train_step, _ = make_step_fns(model)
    host = np.random.RandomState(0)
    pts, labels, normals, prim = make_shape_batch(host, batch * accum, n_points)
    x = np.concatenate([pts, normals], -1).astype(np.float32)
    xb = jnp.asarray(x.reshape(accum, batch, n_points, 6))
    lb = jnp.asarray(labels.reshape(accum, batch, -1))
    pb = jnp.asarray(prim.reshape(accum, batch, -1))
    # compile; sync via host fetch — block_until_ready on donated buffers
    # reports ready prematurely on the tunneled runtime
    state, m = train_step(state, xb, lb, pb, jax.random.PRNGKey(1),
                          jnp.float32(0.01))
    float(m["embed_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = train_step(state, xb, lb, pb, jax.random.PRNGKey(i),
                              jnp.float32(0.01))
        float(m["embed_loss"])
    dt = (time.perf_counter() - t0) / steps
    shapes_s = batch * accum / dt
    print(json.dumps({"metric": "seg_train_shapes_per_sec",
                      "value": round(shapes_s, 2), "unit": "shapes/s",
                      "detail": {"step_ms": round(dt * 1e3, 1),
                                 "batch": batch, "accum": accum,
                                 "points": n_points, "bf16": _BF16,
                                 "remat": _REMAT,
                                 "embed_loss": float(m["embed_loss"])}}))


def bench_e2e(batch=1, n_points=8000, steps=3, ablate=None, tag=""):
    """BT_ABLATE: comma list of stages to stub inside the jitted step for
    in-context costing (the bench.py BENCH_ABLATE pattern; standalone stage
    timing is unreliable over the tunnel). Arms: nograd (time eval_step:
    prices the whole backward pass), netgrad (stop-grad at net outputs:
    prices the DGCNN backward), fit (skip the entire fitting loss), ms
    (GT-cluster stub for mean-shift + matching), match (identity LAP),
    fits (skip geometric fits + residuals), splines (spline_fit=None).
    BT_MS_SAMPLES: mean-shift subsample (default 5000 here; run_training
    uses make_e2e_step's 2048 default — measure both)."""
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.train.state import create_state
    from parsenet_tpu.train.train_e2e import build_spline_fit, make_e2e_step

    batch = int(os.environ.get("BT_BATCH", batch))
    n_points = int(os.environ.get("BT_POINTS", n_points))
    ms_samples = int(os.environ.get("BT_MS_SAMPLES", 5000))
    # round-5 perf knobs (fitting_loss_shape docstring has the
    # reference-parity argument per knob); BT_FAST=1 = the exact
    # Config.fast_step bundle the trainer ships (FAST_STEP_KNOBS)
    from parsenet_tpu.train.train_e2e import FAST_STEP_KNOBS
    fast = dict(FAST_STEP_KNOBS) if os.environ.get("BT_FAST", "0") == "1" \
        else {}
    spline_stride = int(os.environ.get("BT_SPLINE_STRIDE",
                                       fast.get("spline_stride", 2)))
    residual_stride = int(os.environ.get("BT_RES_STRIDE",
                                         fast.get("residual_stride", 1)))
    siou_stride = int(os.environ.get("BT_SIOU_STRIDE",
                                     fast.get("siou_stride", 1)))
    ms_att = int(os.environ.get("BT_MS_ATT",
                                fast.get("ms_attempt_iterations", 0) or 0)) \
        or None
    ms_att_pallas = os.environ.get("BT_MS_PALLAS", "0") == "1"
    if ablate is None:
        ablate = tuple(a for a in os.environ.get("BT_ABLATE", "").split(",")
                       if a)
    nograd = "nograd" in ablate
    ablate = tuple(a for a in ablate if a != "nograd")
    # train-graph kNN recall: BT_FAST=1 measures the exact shipped bundle
    # (FAST_KNN_RECALL, like run_training); BT_KNN_RECALL isolates the knob
    from parsenet_tpu.train.train_e2e import FAST_KNN_RECALL
    knn_recall = float(os.environ.get(
        "BT_KNN_RECALL", FAST_KNN_RECALL if fast else 0.0))
    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80,
                                knn_recall=knn_recall, **_model_kw())
    state = create_state(model, jax.random.PRNGKey(0),
                         (jnp.zeros((batch, n_points, 6)),))
    spline_fit = None if "splines" in ablate else build_spline_fit(grid=20)
    train_step, eval_step = make_e2e_step(
        model, spline_fit, iterations=5, ms_num_samples=ms_samples,
        spline_stride=spline_stride, residual_stride=residual_stride,
        siou_stride=siou_stride, ms_attempt_iterations=ms_att,
        ms_attempt_pallas=ms_att_pallas,
        ablate=tuple(a for a in ablate if a != "splines"))
    host = np.random.RandomState(0)
    pts, labels, normals, prim = make_shape_batch(host, batch, n_points)
    x = jnp.asarray(np.concatenate([pts, normals], -1).astype(np.float32))
    lb, pb = jnp.asarray(labels), jnp.asarray(prim)

    def run(i):
        nonlocal state
        if nograd:
            m = eval_step(state, x, lb, pb, jax.random.PRNGKey(i))
        else:
            state, m = train_step(state, x, lb, pb, jax.random.PRNGKey(i),
                                  jnp.float32(1e-4))
        float(m["res_loss"])
        return m

    m = run(1)
    t0 = time.perf_counter()
    for i in range(steps):
        m = run(i)
    dt = (time.perf_counter() - t0) / steps
    detail = {"step_ms": round(dt * 1e3, 1), "batch": batch,
              "points": n_points, "bf16": _BF16, "remat": _REMAT,
              "ms_samples": ms_samples,
              "spline_stride": spline_stride,
              "residual_stride": residual_stride,
              "siou_stride": siou_stride,
              "ms_att": ms_att or 0, "ms_att_pallas": ms_att_pallas,
              "knn_recall": knn_recall,
              "ablate": ",".join(ablate) + (",nograd" if nograd else ""),
              "res_loss": float(m["res_loss"])}
    if not nograd:
        detail["grad_ok"] = float(m["grad_ok"])
    print(json.dumps({"metric": "e2e_train_shapes_per_sec" +
                                (f"_{tag}" if tag else ""),
                      "value": round(batch / dt, 3), "unit": "shapes/s",
                      "detail": detail}), flush=True)
    return dt


def bench_e2e_ablate():
    """Run the full in-context ablation sweep and print a cost breakdown.
    Each arm is one jitted-graph variant timed in-process; deltas vs the
    full step localize where the ~200 ms goes (VERDICT round-3 task 6)."""
    arms = [("full", ()), ("nograd", ("nograd",)), ("netgrad", ("netgrad",)),
            ("fit", ("fit",)), ("ms", ("ms",)), ("match", ("match",)),
            ("fits", ("fits",)), ("splines", ("splines",)),
            ("siou", ("siou",))]
    times = {}
    for tag, ab in arms:
        times[tag] = bench_e2e(ablate=ab, tag=tag)
    full = times["full"]
    deltas = {f"cost_{t}_ms": round((full - dt) * 1e3, 1)
              for t, dt in times.items() if t != "full"}
    print(json.dumps({"metric": "e2e_ablation_ms",
                      "value": round(full * 1e3, 1), "unit": "ms/step",
                      "detail": deltas}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("seg", "all"):
        bench_seg()
    if which in ("e2e", "all"):
        bench_e2e()
    if which == "e2e_ablate":
        bench_e2e_ablate()
