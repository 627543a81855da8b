"""Device-mesh parallelism utilities."""

from supervised_dispnet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    spatial_size,
    DATA_AXIS,
    SPATIAL_AXIS,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "spatial_size",
    "DATA_AXIS",
    "SPATIAL_AXIS",
]
