"""Production-shape sharded rehearsal on the 8-device CPU mesh.

VERDICT round-3 task 7: the sharded-inference evidence so far ran toy dims
(N=256-512, k=4-8, emb 16-32) — enough to prove wiring and metric equality,
not enough to surface layout/memory surprises a real v5e-8 program would
hit. This script executes the SAME batched eval program bench.py's
BENCH_SHARD=1 path builds (parsenet_tpu.eval.sharded.make_batched_eval) at
FULL production dimensions — 10k points/shape, k=80 neighbours, 128-d
embedding, mean-shift 50 iters on 5000 samples, trained params + spline
decoders, batch 8 = one shape per device — once sharded over the mesh and
once unsharded, and asserts the metrics match.

Reference bar: BASELINE.md's north star is defined on a v5e-8; the
reference itself has no multi-device eval (test.py is a single-GPU loop).

Run (CPU, slow — ~tens of minutes on the 1-core host; that's fine, the
point is that the program compiles and executes at production scale):

  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/shard_rehearsal.py [out.json]

A pytest-marked-slow wrapper lives in tests/test_bench_shard.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n_pts=10000, batch=8, ms_samples=5000, ms_iters=50, seed=7):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from parsenet_tpu.data.abc import normalize_points
    from parsenet_tpu.data.synthetic import make_shape_batch
    from parsenet_tpu.eval.sharded import make_batched_eval
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.parallel.mesh import batch_sharding, make_mesh
    from parsenet_tpu.train.train_e2e import build_spline_fit

    devices = jax.devices()
    model = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5,
                                k=80)
    # shipped npz export directly (NOT `import bench` — that would arm the
    # bench watchdog, and a slow 1-core CPU rehearsal can legitimately
    # outlive it), so the rehearsal runs the exact shipping weights
    from parsenet_tpu.core.checkpoint import load_npz_params
    npz = load_npz_params(os.environ.get("BENCH_PARAMS",
                                         "params/parsenet_e2e.npz"))
    trained = npz is not None
    if trained:
        params = npz["params"]
    else:  # layout rehearsal still valid on random init
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 256, 6)))["params"]
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))
    spline_fit = build_spline_fit(grid=20)

    host = np.random.RandomState(seed)
    pts, labels, normals, prim = make_shape_batch(host, batch, n_pts)
    for i in range(batch):
        pts[i], normals[i], _, _ = normalize_points(pts[i], normals[i])
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    args = (jnp.asarray(pts.astype(np.float32)),
            jnp.asarray(normals.astype(np.float32)),
            jnp.asarray(labels), jnp.asarray(prim), keys)
    kw = dict(ms_num_samples=ms_samples, ms_iterations=ms_iters)

    t0 = time.monotonic()
    un = make_batched_eval(apply_fn, spline_fit, **kw)
    ref = np.asarray(un(*args))
    t_unsharded = time.monotonic() - t0

    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    sharded_args = tuple(jax.device_put(a, bsh) for a in args)
    placement_ok = True
    for a in sharded_args[:4]:
        shards = a.addressable_shards
        placement_ok &= (len(shards) == len(devices)
                         and sorted(s.data.shape[0] for s in shards)
                         == [batch // len(devices)] * len(devices)
                         and len({s.device for s in shards}) == len(devices))
    t0 = time.monotonic()
    sh = make_batched_eval(apply_fn, spline_fit, mesh=mesh, **kw)
    out = sh(*sharded_args)
    replicated_ok = bool(out.sharding.is_fully_replicated)
    got = np.asarray(out)
    t_sharded = time.monotonic() - t0

    names = ["residual_sum", "seg_iou_sum", "p_cov_sum", "sk_2_sum"]
    # tolerance: unlike the toy-dim equality test (rtol 2e-5, untrained
    # params), trained weights at production dims see genuinely different
    # XLA fusion between the vmap(8)-on-one-device and per-device-batch-1
    # programs; f32 rounding differences then shift a handful of
    # clustering-boundary points, moving the reconstruct metrics by
    # O(0.1%) (measured 0.41% max at N=512 smoke dims). 1% still catches
    # any real sharding bug (wrong shard, dropped shape, bad reduction).
    max_rel = float(np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-6)))
    return {
        "n_points": n_pts, "batch": batch, "k": 80, "emb": 128,
        "ms_samples": ms_samples, "ms_iterations": ms_iters,
        "devices": len(devices), "platform": devices[0].platform,
        "trained_params": bool(trained),
        "placement_one_shape_per_device": bool(placement_ok),
        "output_replicated": replicated_ok,
        "unsharded": {n: float(v) for n, v in zip(names, ref)},
        "sharded": {n: float(v) for n, v in zip(names, got)},
        "max_rel_diff": max_rel,
        "metrics_match": bool(max_rel < 1e-2),
        "wall_s": {"unsharded": round(t_unsharded, 1),
                   "sharded": round(t_sharded, 1)},
    }


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    res = run()
    line = json.dumps(res)
    print(line, flush=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    ok = (res["metrics_match"] and res["placement_one_shape_per_device"]
          and res["output_replicated"])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
