"""Full fitting + reconstruction evaluation (reference: test.py).

Reads predictions.h5 (from generate_predictions.py), fits every segment,
and reports residual + coverage (sk/pk @ {0.01, 0.02}) + SIOU.

Usage: python test.py configs/config_parsenet_normals.yml [start] [end]
"""
import sys

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.core.config import load_config
from parsenet_tpu.core.logging import setup_logging
from parsenet_tpu.data.abc import ABCDataset
from parsenet_tpu.eval.pipeline import reconstruct_shape
from parsenet_tpu.train.train_e2e import build_spline_fit


def main():
    cfg = load_config(sys.argv[1] if len(sys.argv) > 1 else None)
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    end = int(sys.argv[3]) if len(sys.argv) > 3 else cfg.num_test
    log = setup_logging(cfg.log_dir, "test")
    ds = ABCDataset(1, train_size=0, val_size=cfg.num_val,
                    test_size=cfg.num_test, normals=True, primitives=True,
                    if_train_data=False)
    with h5py.File("logs/predictions.h5", "r") as hf:
        seg_ids = np.array(hf.get("seg_id"))
        pred_prims = np.array(hf.get("pred_primitives"))
    spline_fit = build_spline_fit(cfg.grid_size, log_dir=cfg.log_dir)
    key = jax.random.PRNGKey(cfg.seed)
    res, cov, sk1, sk2 = [], [], [], []
    for i, (points, labels, normals, prim) in enumerate(ds.get_test()):
        if i < start:
            continue
        if i >= end:
            break
        key, sub = jax.random.split(key)
        rec = reconstruct_shape(jnp.asarray(points[0]), jnp.asarray(normals[0]),
                                jnp.asarray(seg_ids[i]),
                                jnp.asarray(pred_prims[i]), sub,
                                spline_fit=spline_fit)
        res.append(float(rec.residual)); cov.append(float(rec.p_cov))
        sk1.append(float(rec.sk_1)); sk2.append(float(rec.sk_2))
        log.info("shape %d residual %.4f cov %.4f sk1 %.3f sk2 %.3f", i,
                 res[-1], cov[-1], sk1[-1], sk2[-1])
    log.info("MEAN residual %.4f chamfer-cov %.4f sk1 %.3f sk2 %.3f",
             np.mean(res), np.mean(cov), np.mean(sk1), np.mean(sk2))


if __name__ == "__main__":
    main()
