"""End-to-end throughput benchmark on the real chip.

Measures the full inference pipeline per ABC-scale shape (10k points):
segmentation forward (DGCNN, k=80) -> mean-shift clustering (50 iterations,
quantile 0.015, NMS + bandwidth guard) -> per-segment primitive fits +
surface sampling + residual/coverage metrics — i.e. the work of the
reference's generate_predictions.py + test.py per shape.

The model is the TRAINED round-2 checkpoint (logs/checkpoints/* when
present, else the committed params/*.npz exports), so the quality fields in
the JSON detail are meaningful, and the bench FAILS (exit 1, after printing
the JSON line) if trained-model quality drops below the stored floor —
a perf "win" cannot silently destroy quality (VERDICT round-1 task 3).

Prints ONE JSON line:
  {"metric": "abc_shapes_per_hour_e2e", "value": N, "unit": "shapes/hour",
   "vs_baseline": R}
vs_baseline R = (measured shapes/hour per chip) / (north-star per-chip rate),
where the north star is 10,000 shapes/hour on a v5e-8 (BASELINE.md), i.e.
1,250 per chip. R > 1 beats the target.
"""
import json
import os
import sys
import time

# Throughput entry point: opt into approx-kNN recall 0.85 (library default
# is the quality-safe 0.95; ops/knn.py documents the measured A/B). The env
# must be set BEFORE parsenet_tpu imports; the quality floors below guard
# the tradeoff on every run.
os.environ.setdefault("PARSENET_KNN_RECALL", "0.85")

# Relay pre-flight: probe the remote backend's claim leg in fresh
# subprocesses (bounded retries) BEFORE this process claims a chip, so a
# transiently wedged / slow relay becomes a delayed success instead of a
# zero-value watchdog artifact. BENCH_PREFLIGHT: "0" off, "1" force on,
# unset = auto (on unless the env pins the cpu platform, e.g. CPU tests).
_PREFLIGHT = os.environ.get("BENCH_PREFLIGHT", "")
# "cpu env" = either the platform pin or an emptied axon pool (the two knobs
# CLAUDE.md documents for CPU runs); config-based CPU runs
# (jax.config.update) should also set one of these or BENCH_PREFLIGHT=0.
_CPU_ENV = (os.environ.get("JAX_PLATFORMS", "") == "cpu"
            or os.environ.get("PALLAS_AXON_POOL_IPS", None) == "")
if _PREFLIGHT == "1" or (_PREFLIGHT != "0" and not _CPU_ENV):
    from parsenet_tpu.core.preflight import wait_for_backend
    if not wait_for_backend(
            budget_s=float(os.environ.get("BENCH_PREFLIGHT_BUDGET_S", "1500")),
            probe_timeout_s=float(os.environ.get("BENCH_PREFLIGHT_PROBE_S",
                                                 "420")),
            sleep_s=float(os.environ.get("BENCH_PREFLIGHT_SLEEP_S", "20"))):
        print(json.dumps({
            "metric": "abc_shapes_per_hour_e2e", "value": 0.0,
            "unit": "shapes/hour", "vs_baseline": 0.0,
            "detail": {"error": "preflight: TPU relay unreachable within "
                                "budget (claim leg wedged)"}}), flush=True)
        raise SystemExit(2)

import threading

# Relay-wedge watchdog: the tunneled runtime's claim leg can hang forever
# (observed: a fresh client blocked >90 min after a pool handoff). A bench
# that never returns is worse than one that reports the outage — emit a
# diagnostic JSON line and exit hard if we blow the wall-clock budget.
# Generous default: first-run TPU compiles of the big graphs are 10-20 min.
_WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", "3600"))


def _watchdog():
    print(json.dumps({
        "metric": "abc_shapes_per_hour_e2e", "value": 0.0,
        "unit": "shapes/hour", "vs_baseline": 0.0,
        "detail": {"error": f"watchdog: no result within {_WATCHDOG_S:.0f}s "
                            "(TPU relay wedged or compile runaway)"}}),
          flush=True)
    os._exit(2)


if _WATCHDOG_S > 0:
    _timer = threading.Timer(_WATCHDOG_S, _watchdog)
    _timer.daemon = True  # must not keep a finished bench process alive
    _timer.start()

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: first-run TPU compiles of the k=80 DGCNN +
# clustering + fitting graphs are expensive; cache them across invocations
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# BENCH_POINTS < 10000 is a reduced-scale debug/CI mode (e.g. driving the
# sharded path on the virtual CPU mesh); quality floors are calibrated at
# the production 10k scale and only enforced there.
NUM_POINTS = int(os.environ.get("BENCH_POINTS", "10000"))
# re-measured round 3 with the fully fused pipeline + trained params:
# B=4 28.2k, B=8 26.0k shapes/hour (and gather_bf16=1 at B=4 27.7k) —
# B=4 is the sweet spot; larger batches grow the EdgeConv working set
# past VMEM without amortizing any remaining fixed cost
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
WARMUP = 2  # batches
ITERS = int(os.environ.get("BENCH_ITERS", "8"))  # batches (BATCH*ITERS shapes)
# validate the eval-stream selector up front: a typo'd BENCH_STREAM used to
# surface as a bare KeyError only after the expensive preflight/compile setup
STREAM = os.environ.get("BENCH_STREAM", "a")
if STREAM not in ("a", "b"):
    raise SystemExit(f"bench: BENCH_STREAM={STREAM!r} invalid; allowed "
                     "values: 'a' (primary gate stream), 'b' (disjoint "
                     "promotion-noise stream)")

# Quality floors for the TRAINED model on the fixed synthetic eval stream:
# ONE home (configs/quality_floors.json), per eval protocol — this bench uses
# the "bench" floors; scripts/validate_reference.py uses the "validate"
# floors (its 24-shape exact-kNN protocol scores ~5pt lower on the same
# weights, RESULTS.md). Set from the measured frontier minus noise so a
# 2-point IoU regression actually trips the bench.
_REPO = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_REPO, "configs", "quality_floors.json")) as _f:
    _FLOORS = json.load(_f)["bench"]
FLOOR_SEG_IOU = _FLOORS["seg_iou_min"]
CEIL_RESIDUAL = _FLOORS["residual_max"]
FLOOR_SK2 = _FLOORS["sk_2_min"]


def load_trained_params(model):
    """Trained segmentation params. Resolution order (VERDICT round-3 task 4):

    1. BENCH_PARAMS, when EXPLICITLY set — the shipping gate measures the
       named npz export and nothing else (`BENCH_PARAMS=/tmp/cand.npz python
       bench.py` runs BEFORE anything is copied into params/ — see
       scripts/finetune_e2e.py). A stale orbax checkpoint must never shadow
       the gate's candidate, so orbax is SKIPPED (with a warning if one
       exists).
    2. Otherwise: latest orbax checkpoint (fresh training runs), then the
       committed params/parsenet_e2e.npz export.

    Returns (params, trained_flag)."""
    from parsenet_tpu.core.checkpoint import Checkpointer, load_npz_params
    target = {"params": model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 256, 6)))["params"]}

    def npz_params(path):
        npz = load_npz_params(path)
        if npz is None:
            return None
        import jax.tree_util as jtu
        want = jtu.tree_leaves(target["params"])
        got = jtu.tree_leaves(npz["params"])
        if len(want) == len(got) and all(
                np.shape(a) == np.shape(b) for a, b in zip(want, got)):
            return npz["params"]
        print(f"bench: WARNING {path} exists but does not match the model "
              "tree; ignoring", file=sys.stderr)
        return None

    # NOTE: resolution is cwd-relative BY DESIGN (bench runs from the repo
    # root; tests sandbox via chdir). Only the SplineNet-source probe below
    # mirrors build_spline_fit's module-relative committed-npz path.
    explicit = os.environ.get("BENCH_PARAMS")
    orbax_dirs = [n for n in ("parsenet_e2e", "parsenet_seg_normals")
                  if os.path.isdir(f"logs/checkpoints/{n}")
                  and any(True for _ in os.scandir(f"logs/checkpoints/{n}"))]
    if explicit:
        if orbax_dirs:
            print(f"bench: BENCH_PARAMS={explicit} overrides orbax "
                  f"checkpoint(s) {orbax_dirs} — measuring the npz",
                  file=sys.stderr)
        p = npz_params(explicit)
        if p is None:
            raise SystemExit(f"bench: BENCH_PARAMS={explicit} missing or "
                             "incompatible — refusing to silently measure "
                             "a different model")
        return p, True
    for ckpt_name in ("parsenet_e2e", "parsenet_seg_normals"):
        try:
            ckpt = Checkpointer(f"logs/checkpoints/{ckpt_name}")
            if ckpt.latest_step() is not None:
                return ckpt.restore(target)["params"], True
        except Exception:
            pass
    p = npz_params("params/parsenet_e2e.npz")
    if p is not None:
        return p, True
    print("bench: WARNING no trained checkpoint; random init, "
          "quality floor skipped", file=sys.stderr)
    return target["params"], False


def _splinenets_restorable(log_dir):
    """True iff BOTH decoder checkpoints under log_dir/checkpoints have a
    restorable orbax step — the exact test build_spline_fit's loader applies
    (train_e2e.load_splinenet_variables: Checkpointer.latest_step). A mere
    non-empty directory (interrupted write, leftover files) is NOT enough:
    build_spline_fit would fall back to the shipped params/ npz while the
    artifact claimed candidate decoders."""
    from parsenet_tpu.core.checkpoint import Checkpointer
    for name in ("open_splinenet", "closed_splinenet"):
        d = os.path.join(log_dir, "checkpoints", name)
        # isdir first: Checkpointer() mkdirs its directory, and a probe
        # must not create empty checkpoint dirs as a side effect
        if not os.path.isdir(d):
            return False
        try:
            if Checkpointer(d).latest_step() is None:
                return False
        except Exception:
            return False
    return True


def check_spline_dir():
    """Validate BENCH_SPLINE_DIR before any expensive setup.

    BENCH_SPLINE_DIR points the pipeline at a training dir's
    checkpoints/{open,closed}_splinenet decoders (the from-scratch gate uses
    this so a candidate is measured with ITS decoders, not the shipped
    ones). An EXPLICIT setting whose checkpoints are not RESTORABLE is a
    hard error (mirrors the BENCH_PARAMS refuse-to-silently-substitute
    rule): a resumed gate after the training dir was lost or a checkpoint
    write was interrupted must not quietly measure the shipped decoders
    instead."""
    spline_dir = os.environ.get("BENCH_SPLINE_DIR")
    if spline_dir and not _splinenets_restorable(spline_dir):
        raise SystemExit(
            f"bench: BENCH_SPLINE_DIR={spline_dir} is explicitly set but "
            "checkpoints/{open,closed}_splinenet has no restorable step — "
            "refusing to silently fall back to the shipped decoders")
    return spline_dir


def spline_source(log_dir):
    """Which SplineNet decoder source build_spline_fit(log_dir=...) will use,
    recorded in the bench detail so gate artifacts are self-describing
    (mirrors build_spline_fit's resolution: restorable checkpoints first,
    then the committed params/ npz exports, else random)."""
    if _splinenets_restorable(log_dir):
        return f"{log_dir}/checkpoints"
    if all(os.path.exists(os.path.join(_REPO, "params", f"{n}.npz"))
           for n in ("open_splinenet", "closed_splinenet")):
        return "params"
    return "random"


def main():
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.eval.pipeline import predict_segmentation, reconstruct_shape
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.train.train_e2e import build_spline_fit

    n_dev = len(jax.devices())
    # BENCH_DGCNN_BF16=1: bf16 COMPUTE dtype through the whole DGCNN
    # (activations + Dense matmuls; params and GroupNorm statistics stay
    # f32) — round-5 roofline lever. Distinct from BENCH_GATHER_BF16, which
    # only halves the neighbour-gather bytes (measured slightly NEGATIVE,
    # RESULTS.md round-3 table). Quality-floored like every bench knob.
    dgcnn_bf16 = os.environ.get("BENCH_DGCNN_BF16", "0") == "1"
    model = PrimitivesEmbedding(
        emb_size=128, num_primitives=10, mode=5, k=80,
        dtype=jnp.bfloat16 if dgcnn_bf16 else jnp.float32,
        gather_bf16=os.environ.get("BENCH_GATHER_BF16", "0") == "1")
    params, trained = load_trained_params(model)
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))
    spline_dir = check_spline_dir()
    spline_src = spline_source(spline_dir or "logs")
    spline_fit = build_spline_fit(grid=20, log_dir=spline_dir or "logs")

    # Two deterministic held-out eval streams (VERDICT round-3 task 5):
    # stream "a" (seed 7, the default — all historical BENCH_r*.json numbers)
    # and stream "b" (seed 1013) — both disjoint from the synthetic training
    # h5s (seeds 0/1/2), so the quality fields are held-out, not memorized.
    # Promotion rule (RESULTS.md): candidates must be floors-green on stream
    # "a" AND within noise (~0.02 sk_2 across 32-shape slices) on stream "b"
    # before params/ is touched — guards select-on-the-gate overfitting.
    stream = STREAM  # validated at import time
    host = np.random.RandomState({"a": 7, "b": 1013}[stream])
    n_shapes = (WARMUP + ITERS) * BATCH
    pts, labels, normals, prim = make_shape_batch(host, n_shapes, NUM_POINTS)
    # eval-mode canonicalization, exactly what ABCDataset.get_test feeds the
    # model (mean-center + PCA align + bbox scale): the network is trained on
    # canonical shapes, so raw shapes are out-of-distribution and the quality
    # fields would be meaningless (measured: seg_iou 0.78 raw vs 0.84 aligned)
    from parsenet_tpu.data.abc import normalize_points
    for i in range(n_shapes):
        pts[i], normals[i], _, _ = normalize_points(pts[i], normals[i])
    pts = pts.astype(np.float32)
    normals = normals.astype(np.float32)

    key = jax.random.PRNGKey(1)

    # ONE jit program for a BATCH of shapes: the tunneled TPU runtime has
    # high per-dispatch latency and small ops underfill the chip, so the
    # whole per-shape pipeline is vmapped over shapes and fused. The metric
    # sums are computed INSIDE the program so each timed iteration is one
    # dispatch + one [2]-float fetch — eager jnp.sum between jits used to
    # cost an extra relay roundtrip per metric.
    # BENCH_ABLATE: comma list of sections to stub out for in-context stage
    # costing (ground-truth ablation — the tunnel makes standalone stage
    # timing unreliable). Sections: ms (clustering + SIOU), siou (SIOU
    # matching only — mean-shift still runs), recon, splines, preprocess,
    # coverage, residual. Production runs leave it unset.
    ablate = tuple(s for s in os.environ.get("BENCH_ABLATE", "").split(",")
                   if s)
    sfit = None if "splines" in ablate else spline_fit
    skip = tuple(s for s in ablate if s in ("coverage", "residual"))

    # BENCH_SHARD=1: shard the shape batch over ALL devices ("data" axis of
    # a jax.sharding.Mesh) — the north-star v5e-8 configuration run as one
    # program instead of extrapolating single-chip rate / n_dev. Same
    # per-shape pipeline (parsenet_tpu.eval.sharded), metric equality with
    # the unsharded path is pytest-asserted on an 8-device CPU mesh.
    shard = os.environ.get("BENCH_SHARD", "0") == "1" and n_dev > 1
    mesh = None
    if shard:
        if ablate:
            raise SystemExit("BENCH_SHARD and BENCH_ABLATE are exclusive")
        if BATCH % n_dev:
            raise SystemExit(f"BENCH_BATCH={BATCH} not divisible by "
                             f"{n_dev} devices")
        from parsenet_tpu.parallel.mesh import batch_sharding, make_mesh
        mesh = make_mesh()

    def shape_pipeline(p, n, lab, pr, key):
        # network input built ON DEVICE: shipping concat(pts, normals)
        # separately would transfer the same 960 KB/batch twice over the
        # tunnel
        x = jnp.concatenate([p, n], axis=-1)
        k1, k2 = jax.random.split(key)
        ms_bf16 = os.environ.get("BENCH_MS_BF16", "1") == "1"
        if "ms" in ablate:  # ablation: ground-truth labels, no clustering
            from parsenet_tpu.eval.pipeline import SegmentationPrediction
            emb, prim_logp = apply_fn(x[None])
            pred = SegmentationPrediction(
                lab, jnp.argmax(prim_logp[0], -1), emb[0],
                jnp.float32(1.0), jnp.float32(1.0), jnp.int32(0))
        else:
            # bf16 mean-shift dots: bench perf knob (27.2k -> 28.8k
            # shapes/hour), label-identical on this trained eval stream and
            # guarded by the quality floors; library default is f32
            pred = predict_segmentation(apply_fn, x, lab, pr, k1,
                                        ms_bf16=ms_bf16,
                                        ms_num_samples=min(5000, NUM_POINTS),
                                        skip_siou="siou" in ablate)
        if "recon" in ablate:
            zero = jnp.zeros(())
            return pred, zero
        rec = reconstruct_shape(p, n, pred.labels, pred.pred_prim, k2,
                                spline_fit=sfit,
                                eval_preprocess="preprocess" not in ablate,
                                profile_skip=skip)
        return pred, rec

    def batch_metrics(p, n, lab, pr, keys):
        if BATCH == 1:
            pred, rec = shape_pipeline(p, n, lab, pr, keys[0])
        else:
            pred, rec = jax.vmap(shape_pipeline)(p, n, lab, pr, keys)
        if not hasattr(rec, "residual"):
            z = jnp.sum(rec)
            return jnp.stack([z, jnp.sum(pred.seg_iou), z, z])
        # fetch EVERY headline metric: outputs that are never fetched are
        # dead code to XLA, so a residual-only fetch would silently drop
        # the coverage computation from the measured program
        return jnp.stack([jnp.sum(rec.residual), jnp.sum(pred.seg_iou),
                          jnp.sum(rec.p_cov), jnp.sum(rec.sk_2)])

    if shard:
        from parsenet_tpu.eval.sharded import make_batched_eval
        batched = make_batched_eval(
            apply_fn, spline_fit, mesh=mesh,
            ms_bf16=os.environ.get("BENCH_MS_BF16", "1") == "1",
            ms_num_samples=min(5000, NUM_POINTS))
        bsh = batch_sharding(mesh)
    else:
        batched = jax.jit(batch_metrics)
        bsh = None

    def stage(b):
        """Start the host->device copies for batch b (async; overlaps the
        previous batch's compute on the tunnel)."""
        s = slice(b * BATCH, (b + 1) * BATCH) if BATCH > 1 else b
        return tuple(jax.device_put(a[s], bsh) for a in
                     (pts, normals, labels, prim))

    def one_batch(staged, key):
        keys = jax.random.split(key, max(BATCH, 1))
        if shard:
            keys = jax.device_put(keys, bsh)
        return batched(*staged, keys)

    # warmup/compile
    staged = stage(0)
    for b in range(WARMUP):
        key, sub = jax.random.split(key)
        out = one_batch(staged, sub)
        jax.block_until_ready(out)
        staged = stage(b + 1)

    sums = np.zeros(4)
    t0 = time.perf_counter()
    pending = []
    for b in range(WARMUP, WARMUP + ITERS):
        key, sub = jax.random.split(key)
        pending.append(one_batch(staged, sub))
        if b + 1 < WARMUP + ITERS:
            staged = stage(b + 1)  # prefetch next batch during compute
        # one batch stays in flight so the per-batch metric fetch (a full
        # relay roundtrip) overlaps the next batch's compute; every batch
        # is still fetched via np.asarray (the experimental axon runtime
        # under-reports wildly with a single trailing block_until_ready),
        # and the clock stops only after ALL outputs are on the host
        if len(pending) > 1:
            sums += np.asarray(pending.pop(0))
    while pending:
        sums += np.asarray(pending.pop(0))
    dt = time.perf_counter() - t0
    res_sum, iou_sum = float(sums[0]), float(sums[1])
    cov_mean = float(sums[2]) / (ITERS * BATCH)
    sk2_mean = float(sums[3]) / (ITERS * BATCH)

    shapes_per_sec = ITERS * BATCH / dt
    shapes_per_hour = shapes_per_sec * 3600.0
    residual = res_sum / (ITERS * BATCH)
    seg_iou = iou_sum / (ITERS * BATCH)
    # floors are calibrated on the primary stream at production scale; the
    # secondary stream reports metrics for the two-stream promotion rule but
    # does not hard-fail (its noise band is documented, not floored).
    # floors_applied makes that self-describing in the artifact: a stream-b /
    # reduced-scale / untrained run prints quality_ok=true with
    # floors_applied=false, so parsers cannot misread "floors green" into it.
    # an ablated program is NOT the production pipeline (stubbed stages
    # report zeroed metrics by design), so stage-costing runs never floor
    floors_applied = (trained and NUM_POINTS == 10000 and stream == "a"
                      and not ablate)
    quality_ok = (not floors_applied) or (
        seg_iou >= FLOOR_SEG_IOU and residual <= CEIL_RESIDUAL
        and sk2_mean >= FLOOR_SK2)
    # north star: 10,000 shapes/hour on a v5e-8 => 1,250 per chip; this bench
    # runs on n_dev real chips, so compare per-chip rate to per-chip target
    per_chip_target = 10000.0 / 8.0
    out = {
        "metric": "abc_shapes_per_hour_e2e",
        "value": round(shapes_per_hour, 1),
        "unit": "shapes/hour",
        "vs_baseline": round((shapes_per_hour / n_dev) / per_chip_target, 4),
        "detail": {
            "per_shape_ms": round(1000.0 * dt / (ITERS * BATCH), 2),
            "batch": BATCH,
            "devices": n_dev,
            "num_points": NUM_POINTS,
            "stream": stream,
            "residual": round(residual, 5),
            "seg_iou": round(seg_iou, 4),
            "p_cov": round(cov_mean, 5),
            "sk_2": round(sk2_mean, 4),
            "trained_params": trained,
            "dgcnn_bf16": dgcnn_bf16,
            "ablate": ",".join(ablate),
            "quality_ok": quality_ok,
            "floors_applied": floors_applied,
            "spline_src": spline_src,
            "floors": {"seg_iou_min": FLOOR_SEG_IOU,
                       "residual_max": CEIL_RESIDUAL,
                       "sk_2_min": FLOOR_SK2},
        },
    }
    print(json.dumps(out))
    if not quality_ok:
        print(f"bench: QUALITY FLOOR VIOLATED: seg_iou {seg_iou:.4f} "
              f"(floor {FLOOR_SEG_IOU}), residual {residual:.5f} "
              f"(ceiling {CEIL_RESIDUAL}), sk_2 {sk2_mean:.4f} "
              f"(floor {FLOOR_SK2})", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
