"""Trainers: SplineNet, segmentation, end-to-end."""
