"""Export trained orbax checkpoints to compact committed npz files.

bench.py needs trained parameters so its quality floor is meaningful
(VERDICT round-1 task 3); orbax checkpoint trees are unwieldy to commit, so
this flattens {params[, batch_stats]} into one float16 .npz per model under
params/ (a few MB each; float16 is lossless enough for inference — verified
by the quality metrics themselves).

Usage: python scripts/export_params.py  (after scripts/train_workflow.py)
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def export(ckpt_dir: str, out_path: str, target) -> bool:
    from parsenet_tpu.core.checkpoint import Checkpointer, flatten_tree
    ckpt = Checkpointer(ckpt_dir)
    if ckpt.latest_step() is None:
        print(f"skip {ckpt_dir}: no checkpoint")
        return False
    restored = ckpt.restore(target)
    flat = {k: np.asarray(v) for k, v in flatten_tree(restored).items()}
    half = {}
    for k, v in flat.items():
        # batch stats stay f32 (running variances can be tiny); weights go f16
        half[k] = v.astype(np.float16) if k.startswith("params") else v
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **half)
    mb = os.path.getsize(out_path) / 1e6
    print(f"wrote {out_path} ({mb:.1f} MB, {len(half)} arrays, "
          f"step {ckpt.latest_step()})")
    return True


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
    from parsenet_tpu.models.splinenet import SplineNet

    ap = argparse.ArgumentParser()
    ap.add_argument("--e2e-ckpt", default="",
                    help="checkpoint dir name under logs/checkpoints/ to "
                         "export as the segmentation net (e.g. "
                         "parsenet_e2e_ft for the gated continuation "
                         "fine-tune); exports ONLY that model")
    ap.add_argument("--e2e-out", default="params/parsenet_e2e.npz",
                    help="output npz path (use a /tmp candidate path with "
                         "--e2e-ckpt so params/ stays pristine until the "
                         "bench gate passes)")
    ap.add_argument("--log-dir", default="logs",
                    help="training log dir holding checkpoints/ (e.g. "
                         "logs_scratch for the isolated from-scratch "
                         "workflow)")
    ap.add_argument("--spline-out-prefix", default="params/",
                    help="where the {open,closed}_splinenet.npz exports go "
                         "(use a candidate prefix like logs/cand_ so "
                         "params/ stays pristine until the gate passes)")
    args = ap.parse_args()

    seg = PrimitivesEmbedding(emb_size=128, num_primitives=10, mode=5, k=80)
    seg_t = {"params": seg.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 256, 6)))["params"]}
    ck = f"{args.log_dir}/checkpoints"
    if args.e2e_ckpt:
        if not export(f"{ck}/{args.e2e_ckpt}", args.e2e_out, seg_t):
            raise SystemExit(1)
        return
    export(f"{ck}/parsenet_e2e", args.e2e_out, seg_t) \
        or export(f"{ck}/parsenet_seg_normals", args.e2e_out, seg_t)
    for name, mode in (("open_splinenet", 0), ("closed_splinenet", 1)):
        m = SplineNet(grid=20, k=10, mode=mode)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 3)), train=False)
        export(f"{ck}/{name}", f"{args.spline_out_prefix}{name}.npz",
               {"params": v["params"], "batch_stats": v["batch_stats"]})


if __name__ == "__main__":
    main()
