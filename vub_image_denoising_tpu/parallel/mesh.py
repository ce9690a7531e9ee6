"""Device mesh bootstrap and sharding helpers.

Greenfield component (SURVEY.md §2.0): the reference is strictly single-process /
single-device, so its "distributed backend" is nothing; here data parallelism is a
first-class citizen.  The design is the standard JAX recipe: one ``jax.sharding.Mesh``
over all devices, batches sharded on the ``data`` axis, parameters replicated; XLA
inserts the gradient all-reduce over ICI automatically when the jitted train step is
given these shardings.

Works identically on 1 CPU device, N virtual CPU devices
(``--xla_force_host_platform_device_count=N``), a single TPU chip, or a TPU slice.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the given (default: all) devices.

    ``shape`` defaults to putting every device on the first axis.  For 2-D meshes (e.g.
    ("data", "tile") for spatial-tile parallel inference) pass an explicit shape.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for an NHWC batch: split the leading (batch) dim over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def put_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device_put a host batch (pytree of arrays) with batch-dim sharding."""
    sh = shard_batch(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def put_replicated(tree, mesh: Mesh):
    """Device_put a pytree fully replicated over the mesh."""
    sh = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
