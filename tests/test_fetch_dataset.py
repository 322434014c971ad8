"""scripts/fetch_dataset.py schema validation: the real-data landing path
must reject malformed h5s loudly, not at first training step (SURVEY #31;
the download leg itself is untestable in this zero-egress environment)."""
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
import fetch_dataset  # noqa: E402


def _write_good(dest):
    os.makedirs(os.path.join(dest, "data", "shapes"), exist_ok=True)
    os.makedirs(os.path.join(dest, "data", "spline"), exist_ok=True)
    for split in ("train", "val", "test"):
        with h5py.File(os.path.join(dest, "data", "shapes",
                                    f"{split}_data.h5"), "w") as f:
            f["points"] = np.zeros((2, 10000, 3), np.float32)
            f["labels"] = np.zeros((2, 10000), np.int64)
            f["normals"] = np.zeros((2, 10000, 3), np.float32)
            f["prim"] = np.zeros((2, 10000), np.int64)
    for fam in ("open", "closed"):
        with h5py.File(os.path.join(dest, "data", "spline",
                                    f"{fam}_splines.h5"), "w") as f:
            f["points"] = np.zeros((2, 700, 3), np.float32)
            f["controlpoints"] = np.zeros((2, 20, 20, 3), np.float32)


def test_valid_layout_passes(tmp_path):
    _write_good(str(tmp_path))
    assert fetch_dataset.validate(str(tmp_path)) == 0


def test_bad_dtype_and_shape_rejected(tmp_path):
    _write_good(str(tmp_path))
    p = os.path.join(str(tmp_path), "data", "shapes", "val_data.h5")
    with h5py.File(p, "w") as f:
        f["points"] = np.zeros((2, 7000, 3), np.float64)   # wrong pts + f64
        f["labels"] = np.zeros((2, 7000), np.float32)      # wrong kind
        f["normals"] = np.zeros((2, 7000, 4), np.float32)  # wrong last dim
        f["prim"] = np.zeros((2, 7000), np.int64)
    assert fetch_dataset.validate(str(tmp_path)) == 1


def test_missing_key_rejected(tmp_path):
    _write_good(str(tmp_path))
    p = os.path.join(str(tmp_path), "data", "spline", "open_splines.h5")
    with h5py.File(p, "w") as f:
        f["points"] = np.zeros((2, 700, 3), np.float32)    # no controlpoints
    assert fetch_dataset.validate(str(tmp_path)) == 1
