"""Datasets, augmentation, synthetic data, prefetch."""
