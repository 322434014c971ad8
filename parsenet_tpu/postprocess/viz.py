"""Visualization utilities (host-side, renderer-free).

Equivalents of the reference's src/VisUtils.py + src/color_utils.py without
the Open3D render windows (this environment is headless): pastel color
generation, colored segment point clouds, grids of shapes laid out in a
plane, and matplotlib scatter snapshots — all exportable as PLY/PNG.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .meshing import write_ply


def random_pastel_colors(n: int, seed: int = 3) -> np.ndarray:
    """[n, 3] float colors in [0.4, 0.95] (reference: color_utils.py)."""
    rng = np.random.RandomState(seed)
    return 0.4 + 0.55 * rng.rand(n, 3)


def colored_segmentation(points: np.ndarray, labels: np.ndarray,
                         k_max: int = 50) -> np.ndarray:
    """Per-point colors by segment id."""
    palette = random_pastel_colors(k_max)
    return palette[np.clip(labels, 0, k_max - 1)]


def save_segmentation_ply(path: str, points: np.ndarray,
                          labels: np.ndarray) -> None:
    write_ply(path, points, colors=colored_segmentation(points, labels))


def grid_of_shapes(shapes: Sequence[np.ndarray], cols: int = 5,
                   spacing: float = 2.5) -> np.ndarray:
    """Lay out multiple point clouds on a plane grid (reference:
    VisUtils grid renders). Returns concatenated points."""
    out = []
    for i, s in enumerate(shapes):
        r, c = divmod(i, cols)
        offset = np.array([c * spacing, -r * spacing, 0.0], np.float32)
        out.append(np.asarray(s, np.float32) + offset)
    return np.concatenate(out, 0)


def save_xyz(path: str, points: np.ndarray,
             normals: Optional[np.ndarray] = None) -> None:
    """Plain .xyz export (reference: VisUtils.py:177-199)."""
    arr = points if normals is None else np.concatenate([points, normals], 1)
    np.savetxt(path, arr, fmt="%.6f")


def scatter_png(path: str, points: np.ndarray,
                colors: Optional[np.ndarray] = None, size: float = 1.0) -> None:
    """Matplotlib 3D scatter snapshot (best-effort; headless-safe)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], c=colors, s=size)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
