"""Geometry / clustering / matching ops (see module docstrings)."""
from . import (bspline, chamfer, cluster_alt, hungarian, knn, linalg,
               mean_shift, pallas_kernels, primitive_dist, primitive_fits,
               sampling, segmentation, standardize)
