"""Device mesh and sharding helpers."""
from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh,
                   replicate, shard_batch)
