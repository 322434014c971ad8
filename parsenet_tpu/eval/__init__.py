"""Inference and evaluation pipelines."""
from .pipeline import (Reconstruction, SegmentationPrediction,
                       predict_segmentation, reconstruct_shape)
