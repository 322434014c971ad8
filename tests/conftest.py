"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes (SURVEY.md §4: multi-device
tests exercise pjit sharding without a TPU).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
