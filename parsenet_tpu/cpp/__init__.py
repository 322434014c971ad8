"""ctypes bindings for the native host-side components.

The library builds lazily on first use (plain g++, no pybind11 dependency);
set PARSENET_NATIVE_DISABLE=1 to force the pure-python fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libparsenet_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _HERE], check=True,
                       capture_output=True, text=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("PARSENET_NATIVE_DISABLE"):
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.lapjv.restype = ctypes.c_double
    lib.lapjv.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.lapjv_batch.restype = None
    lib.lapjv_batch.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.remove_statistical_outliers.restype = ctypes.c_int32
    lib.remove_statistical_outliers.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    lib.arap_deform.restype = None
    lib.arap_deform.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def solve_dense(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact LAP; drop-in for lapsolver.solve_dense (rids, cids).
    Falls back to scipy when the native library is unavailable."""
    cost = np.ascontiguousarray(cost, np.float64)
    n = cost.shape[0]
    lib = get_lib()
    if lib is None:
        from scipy.optimize import linear_sum_assignment
        r, c = linear_sum_assignment(cost)
        return r.astype(np.int32), c.astype(np.int32)
    col_of_row = np.empty(n, np.int32)
    row_of_col = np.empty(n, np.int32)
    lib.lapjv(cost, n, col_of_row, row_of_col)
    return np.arange(n, dtype=np.int32), col_of_row


def remove_outliers(points: np.ndarray, nb_neighbors: int = 20,
                    std_ratio: float = 2.0) -> np.ndarray:
    """Statistical outlier removal; drop-in for the reference's
    fitting_utils.remove_outliers (returns the kept points)."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lib = get_lib()
    if lib is None:
        d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        k = min(nb_neighbors, n - 1)
        md = np.sort(d, 1)[:, :k].mean(1)
        keep = md <= md.mean() + std_ratio * md.std()
        return pts[keep]
    mask = np.empty(n, np.uint8)
    lib.remove_statistical_outliers(pts, n, nb_neighbors, std_ratio, mask)
    return pts[mask.astype(bool)]


def arap_deform(vertices: np.ndarray, triangles: np.ndarray,
                handle_idx: np.ndarray, handle_pos: np.ndarray,
                max_iter: int = 50) -> np.ndarray:
    """ARAP mesh deformation; drop-in for Open3D's
    deform_as_rigid_as_possible (reference: fitting_optimization.py:71-72).
    Returns the deformed vertices."""
    v = np.ascontiguousarray(vertices, np.float32).copy()
    t = np.ascontiguousarray(triangles, np.int32)
    hi = np.ascontiguousarray(handle_idx, np.int32)
    hp = np.ascontiguousarray(handle_pos, np.float32)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable; ARAP has no "
                           "pure-python fallback")
    lib.arap_deform(v, v.shape[0], t, t.shape[0], hi, hp, hi.shape[0],
                    max_iter)
    return v
