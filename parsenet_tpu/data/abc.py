"""ABC segmentation dataset (host input pipeline).

Equivalent of reference src/dataset_segments.py. Loads the h5 splits
(points [S, N, 3], labels [S, N], normals, prim), mean-centers each shape,
and exposes infinite batch generators with optional augmentation,
normal-noise injection, and PCA canonical alignment. Unlike the reference's
torch DataLoader workers, batches here are plain numpy arrays handed to a
double-buffered device-put prefetcher (data.prefetch).
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import numpy as np

from .augment import AUGMENT_ROUTINES, align_canonical

EPS = np.finfo(np.float32).eps


@dataclasses.dataclass
class Split:
    points: np.ndarray    # [S, N, 3] mean-centered
    labels: np.ndarray    # [S, N] int
    normals: Optional[np.ndarray]
    prim: Optional[np.ndarray]

    @property
    def size(self) -> int:
        return self.points.shape[0]


def _load_h5(path: str, size: Optional[int], normals: bool, primitives: bool) -> Split:
    import h5py
    with h5py.File(path, "r") as hf:
        points = np.array(hf.get("points"))[:size].astype(np.float32)
        labels = np.array(hf.get("labels"))[:size].astype(np.int64)
        nrm = np.array(hf.get("normals"))[:size].astype(np.float32) if normals else None
        prim = np.array(hf.get("prim"))[:size].astype(np.int64) if primitives else None
    means = points.mean(1, keepdims=True)
    return Split(points - means, labels, nrm, prim)


class ABCDataset:
    """(reference: src/dataset_segments.py:14-255)."""

    def __init__(self, batch_size: int, path_prefix: str = "data/shapes/",
                 train_size: Optional[int] = None, val_size: Optional[int] = None,
                 test_size: Optional[int] = None, normals: bool = True,
                 primitives: bool = True, if_train_data: bool = True,
                 seed: int = 0):
        self.batch_size = batch_size
        self.normals = normals
        self.primitives = primitives
        self.rng = np.random.RandomState(seed)
        self.train = (_load_h5(path_prefix + "train_data.h5", train_size,
                               normals, primitives) if if_train_data else None)
        self.val = _load_h5(path_prefix + "val_data.h5", val_size, normals, primitives)
        self.test = _load_h5(path_prefix + "test_data.h5", test_size, normals, primitives)

    # ------------------------------------------------------------------
    def _batches(self, split: Split, randomize: bool, augment: bool,
                 anisotropic: bool, align: bool, if_normal_noise: bool,
                 loop: bool, batch_size: Optional[int] = None) -> Iterator[Tuple]:
        n = split.size
        bs = batch_size or self.batch_size
        if n < bs:
            raise ValueError(
                f"split has {n} shapes < batch size {bs}; an infinite "
                f"generator would never yield")
        while True:
            order = np.arange(n)
            if randomize:
                self.rng.shuffle(order)
            for i in range(n // bs):
                sel = order[i * bs:(i + 1) * bs]
                points = split.points[sel].copy()
                labels = split.labels[sel]
                nrm = split.normals[sel].copy() if split.normals is not None else None
                prim = split.prim[sel] if split.prim is not None else None
                if augment:
                    fn = AUGMENT_ROUTINES[self.rng.choice(len(AUGMENT_ROUTINES))]
                    points = fn(points, self.rng)
                if if_normal_noise and nrm is not None:
                    noise = nrm * np.clip(
                        self.rng.randn(1, points.shape[1], 1) * 0.01,
                        -0.01, 0.01)
                    points = (points + noise).astype(np.float32)
                if align:
                    for j in range(bs):
                        pj, nj, _, _ = align_canonical(
                            points[j], None if nrm is None else nrm[j],
                            anisotropic)
                        points[j] = pj
                        if nj is not None:
                            nrm[j] = nj
                yield points.astype(np.float32), labels, nrm, prim
            if not loop:
                return

    def get_train(self, randomize: bool = True, augment: bool = True,
                  anisotropic: bool = False, align_canonical: bool = True,
                  if_normal_noise: bool = True,
                  batch_size: Optional[int] = None):
        return self._batches(self.train, randomize, augment, anisotropic,
                             align_canonical, if_normal_noise, loop=True,
                             batch_size=batch_size)

    def get_val(self, align_canonical: bool = True, anisotropic: bool = False,
                if_normal_noise: bool = True,
                batch_size: Optional[int] = None):
        return self._batches(self.val, False, False, anisotropic,
                             align_canonical, if_normal_noise, loop=True,
                             batch_size=batch_size)

    def get_test(self, align_canonical: bool = True, anisotropic: bool = False,
                 loop: bool = False, batch_size: Optional[int] = None):
        return self._batches(self.test, False, False, anisotropic,
                             align_canonical, False, loop=loop,
                             batch_size=batch_size or 1)


def normalize_points(points: np.ndarray, normals: Optional[np.ndarray] = None,
                     anisotropic: bool = False):
    """Single-shape canonicalization for eval (reference:
    src/dataset_segments.py:257-274)."""
    points = points - points.mean(0, keepdims=True)
    return align_canonical(points, normals, anisotropic)
