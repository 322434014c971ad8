"""Point-cloud augmentations (host-side numpy).

Equivalent of reference src/augment_utils.py:7-128. These run in the host
input pipeline (like the reference's DataLoader workers); the shapes are
small enough that numpy is never the bottleneck once batches are prefetched.
"""
from __future__ import annotations

import numpy as np


def rotate_point_cloud(batch: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Random yaw rotation per batch item (reference: augment_utils.py:7-25)."""
    out = np.empty_like(batch)
    for k in range(batch.shape[0]):
        angle = rng.uniform() * 2 * np.pi
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], batch.dtype)
        out[k] = batch[k] @ R
    return out


def rotate_perturbation_point_cloud(batch: np.ndarray, rng: np.random.RandomState,
                                    angle_sigma: float = 0.06,
                                    angle_clip: float = 0.18) -> np.ndarray:
    """Small random SO(3) perturbation (reference: augment_utils.py:28-53)."""
    out = np.empty_like(batch)
    for k in range(batch.shape[0]):
        angles = np.clip(angle_sigma * rng.randn(3), -angle_clip, angle_clip)
        cx, sx = np.cos(angles[0]), np.sin(angles[0])
        cy, sy = np.cos(angles[1]), np.sin(angles[1])
        cz, sz = np.cos(angles[2]), np.sin(angles[2])
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = (Rz @ Ry @ Rx).astype(batch.dtype)
        out[k] = batch[k] @ R
    return out


def jitter_point_cloud(batch: np.ndarray, rng: np.random.RandomState,
                       sigma: float = 0.01, clip: float = 0.05) -> np.ndarray:
    """(reference: augment_utils.py:56-70)."""
    noise = np.clip(sigma * rng.randn(*batch.shape), -clip, clip)
    return batch + noise.astype(batch.dtype)


def shift_point_cloud(batch: np.ndarray, rng: np.random.RandomState,
                      shift_range: float = 0.1) -> np.ndarray:
    """(reference: augment_utils.py:73-86)."""
    shifts = rng.uniform(-shift_range, shift_range,
                         (batch.shape[0], 1, 3)).astype(batch.dtype)
    return batch + shifts


def random_scale_point_cloud(batch: np.ndarray, rng: np.random.RandomState,
                             scale_low: float = 0.8,
                             scale_high: float = 1.2) -> np.ndarray:
    """(reference: augment_utils.py:89-103)."""
    scales = rng.uniform(scale_low, scale_high,
                         (batch.shape[0], 1, 1)).astype(batch.dtype)
    return batch * scales


AUGMENT_ROUTINES = (rotate_perturbation_point_cloud, jitter_point_cloud,
                    shift_point_cloud, random_scale_point_cloud,
                    rotate_point_cloud)


class Augment:
    """Apply each augmentation with probability p=0.3
    (reference: augment_utils.py:115-128)."""

    def __init__(self, seed: int = 0, prob: float = 0.3):
        self.rng = np.random.RandomState(seed)
        self.prob = prob

    def augment(self, batch: np.ndarray) -> np.ndarray:
        for fn in AUGMENT_ROUTINES:
            if self.rng.uniform() < self.prob:
                batch = fn(batch, self.rng)
        return batch.astype(np.float32)


def pca_numpy(points: np.ndarray):
    """Eigendecomposition of the covariance (reference: dataset_segments.py:300-302)."""
    S, U = np.linalg.eig(points.T @ points)
    return S, U


def rotation_matrix_a_to_b(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Rotation with R @ A = B (reference: dataset_segments.py:276-298)."""
    EPS = np.finfo(np.float32).eps
    cos = np.dot(A, B)
    sin = np.linalg.norm(np.cross(B, A))
    u = A
    v = B - np.dot(A, B) * A
    v = v / (np.linalg.norm(v) + EPS)
    w = np.cross(B, A)
    w = w / (np.linalg.norm(w) + EPS)
    F = np.stack([u, v, w], 1)
    G = np.array([[cos, -sin, 0], [sin, cos, 0], [0, 0, 1]])
    try:
        R = F @ G @ np.linalg.inv(F)
    except np.linalg.LinAlgError:
        R = np.eye(3, dtype=np.float32)
    return R.astype(np.float32)


def align_canonical(points: np.ndarray, normals: np.ndarray | None = None,
                    anisotropic: bool = False):
    """Rotate the minor principal axis onto x and normalize by bbox extent
    (reference: dataset_segments.py:127-144). Returns (points, normals, R, std).
    """
    EPS = np.finfo(np.float32).eps
    S, U = pca_numpy(points)
    smallest_ev = U[:, np.argmin(S)].real.astype(np.float32)
    R = rotation_matrix_a_to_b(smallest_ev, np.array([1.0, 0, 0], np.float32))
    points = (R @ points.T).T
    if normals is not None:
        normals = (R @ normals.T).T
    std = np.max(points, 0) - np.min(points, 0)
    if anisotropic:
        points = points / (std.reshape(1, 3) + EPS)
    else:
        points = points / (np.max(std) + EPS)
    return points.astype(np.float32), normals, R, std.astype(np.float32)
