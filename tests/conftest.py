"""Test harness: run everything on a virtual 8-device CPU mesh.

This environment's sitecustomize (axon TPU tunnel) imports jax at interpreter
startup, which binds JAX_PLATFORMS=axon from the env — so setting env vars in
a conftest is too late. The backends themselves are still uninitialized at
conftest time, so `jax.config.update` reliably redirects everything to CPU,
and XLA_FLAGS set before the first backend init still takes effect.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the fitting/e2e graphs are compile-heavy;
# caching makes repeat test runs fast
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", \
    jax.devices()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
