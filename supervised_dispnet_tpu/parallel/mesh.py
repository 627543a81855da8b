"""Data-parallel (+ optional spatial-partitioned) sharding over a device
mesh.

The TPU replacement for the reference's ``torch.nn.DataParallel`` wrap
(reference: ``train.py::main``): instead of single-process scatter/gather,
the batch axis is sharded over a ``jax.sharding.Mesh`` and the train step
is jitted over it — XLA inserts the gradient ``psum`` over ICI
automatically from the sharding annotations (params replicated, batch
sharded). Scales from 1 chip to a full slice with no code change.

Spatial partitioning (``make_mesh(spatial=k)``): a second mesh axis
shards the image HEIGHT across devices — GSPMD partitions every conv
along H and inserts halo exchanges over ICI for the kernel overlap.
This is the convnet analog of sequence parallelism: it scales the
per-device activation working set DOWN with the mesh, so full-resolution
inputs (e.g. KITTI 384x1280 instead of the 128x416 dump) fit and speed
up without touching model code. Numerics: the partition is exact as
long as every conv level keeps >= 1 row per shard; the train steps
enforce ``H / max_stride >= spatial`` at trace time (below that XLA's
windowed-partition transpose silently degrades — measured round 4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(devices: list | None = None, spatial: int = 1) -> Mesh:
    """Device mesh: 1-D data-parallel, or 2-D (data, spatial) when
    ``spatial > 1`` — height-sharded convolutions via GSPMD halo
    exchange (see module docstring)."""
    if devices is None:
        devices = jax.devices()
    if spatial <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    n = len(devices)
    if n % spatial:
        raise ValueError(
            f"spatial={spatial} must divide the device count {n}")
    return Mesh(np.asarray(devices).reshape(n // spatial, spatial),
                (DATA_AXIS, SPATIAL_AXIS))


def spatial_size(mesh: Mesh | None) -> int:
    """Number of spatial shards (1 when the mesh has no spatial axis)."""
    if mesh is None or SPATIAL_AXIS not in mesh.axis_names:
        return 1
    return mesh.shape[SPATIAL_AXIS]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with the leading axis sharded.

    On a 1-device mesh this is a PLAIN device_put: arrays committed to a
    NamedSharding take a drastically slower dispatch path through the
    axon TPU relay (measured 93 ms -> 9.2 s/step for the same supervised
    program), and on one device the sharding annotation adds nothing.
    """
    if mesh.size == 1:
        dev = mesh.devices.flat[0]
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev), batch)

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
