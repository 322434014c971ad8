"""Device mesh and sharding helpers.

The reference scales with single-process torch DataParallel (replicate +
scatter/gather, train_parsenet.py:90-91) and a manual cuda:0/cuda:1 model
split in the e2e trainer (train_parsenet_e2e.py:156-159). The TPU-native
design replaces both with a single `jax.sharding.Mesh` and sharding
annotations: the batch ("data") axis is sharded over ICI, parameters are
replicated, and XLA inserts all collectives (psum for gradients). A "model"
axis is exposed for future tensor-sharding, but ParSeNet-scale models
(~few M params) replicate.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: int = 0, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, model) mesh over the local devices.

    num_devices=0 uses every visible device. On a v5e-8 slice this yields an
    8-way data-parallel mesh whose collectives ride ICI.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree on the mesh with batch-axis sharding."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} data shards")
    return global_batch // n
