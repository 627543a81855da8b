"""Data-parallel sharding over a 1-D device mesh.

The TPU replacement for the reference's ``torch.nn.DataParallel`` wrap
(reference: ``train.py::main``): instead of single-process scatter/gather,
the batch axis is sharded over a ``jax.sharding.Mesh`` and the train step
is jitted over it — XLA inserts the gradient ``psum`` over ICI
automatically from the sharding annotations (params replicated, batch
sharded). Scales from 1 chip to a full slice with no code change.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: list | None = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


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
