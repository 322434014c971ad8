"""Segmentation inference over the test split (reference: generate_predictions.py).

Writes predictions.h5 with seg_id [S, N] and pred_primitives [S, N], plus
mean SIOU metrics.

Usage: python generate_predictions.py configs/config_parsenet_normals.yml [out.h5]
"""
import sys

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.core.config import load_config
from parsenet_tpu.core.logging import setup_logging
from parsenet_tpu.data.abc import ABCDataset
from parsenet_tpu.eval.pipeline import predict_segmentation
from parsenet_tpu.models.dgcnn import PrimitivesEmbedding
from parsenet_tpu.core.checkpoint import Checkpointer


def main():
    cfg = load_config(sys.argv[1] if len(sys.argv) > 1 else None)
    out_path = sys.argv[2] if len(sys.argv) > 2 else "logs/predictions.h5"
    log = setup_logging(cfg.log_dir, "generate_predictions")
    with_normals = cfg.mode == 5
    model = PrimitivesEmbedding(emb_size=128, num_primitives=10,
                                mode=5 if with_normals else 0, k=cfg.knn_k)
    ckpt = Checkpointer(f"{cfg.log_dir}/checkpoints/{cfg.model_path}")
    cdim = 6 if with_normals else 3
    target = {"params": model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 256, cdim)))["params"]}
    try:
        restored = ckpt.restore(target)
    except Exception as e:
        raise SystemExit(
            f"checkpoint at {cfg.log_dir}/checkpoints/{cfg.model_path} does "
            f"not match the segmentation model (wrong model_path?): {e}")
    if restored is None:
        raise SystemExit("no checkpoint found; train first")
    params = restored["params"]
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))

    ds = ABCDataset(1, path_prefix=cfg.dataset or "data/shapes/",
                    train_size=0, val_size=cfg.num_val,
                    test_size=cfg.num_test, normals=True, primitives=True,
                    if_train_data=False)
    key = jax.random.PRNGKey(cfg.seed)
    seg_ids, pred_prims, sious, pious = [], [], [], []

    # vmapped batch-4 inference: ~29% faster per shape than one-at-a-time on
    # a v5e chip (same measurement as bench.py); the tail batch is padded by
    # repetition and the padded results dropped
    B = 4
    batched = jax.jit(jax.vmap(
        lambda x, lab, pr, k: predict_segmentation(apply_fn, x, lab, pr, k)))

    def flush(buf, base_idx):
        n = len(buf)
        while len(buf) < B:
            buf.append(buf[-1])
        xs, labs, prims, keys = map(jnp.asarray, zip(*buf))
        pred = batched(xs, labs, prims, keys)
        for j in range(n):
            seg_ids.append(np.asarray(pred.labels[j]))
            pred_prims.append(np.asarray(pred.pred_prim[j]))
            sious.append(float(pred.seg_iou[j]))
            pious.append(float(pred.prim_iou[j]))
            log.info("shape %d: seg iou %.4f prim iou %.4f clusters %d",
                     base_idx + j, sious[-1], pious[-1],
                     int(pred.num_clusters[j]))

    buf, base = [], 0
    for i, (points, labels, normals, prim) in enumerate(ds.get_test()):
        x = np.concatenate([points, normals], -1) if with_normals else points
        key, sub = jax.random.split(key)
        buf.append((x[0].astype(np.float32), labels[0], prim[0], sub))
        if len(buf) == B:
            flush(buf, base)
            buf, base = [], i + 1
    if buf:
        flush(buf, base)
    log.info("MEAN seg iou %.4f prim iou %.4f", np.mean(sious), np.mean(pious))
    with h5py.File(out_path, "w") as hf:
        hf.create_dataset("seg_id", data=np.stack(seg_ids))
        hf.create_dataset("pred_primitives", data=np.stack(pred_prims))


if __name__ == "__main__":
    main()
