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


def shard_spatial(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for an NHWC batch: split the HEIGHT dim over ``axis``.

    Spatial partitioning for high-resolution training/inference where even a
    batch of one image per device is too large: XLA's SPMD partitioner inserts
    the conv halo exchanges (and the down/upsample re-balancing collectives)
    automatically, so the SAME jitted train step runs unmodified — only the
    input placement changes.  H must be divisible by the axis size times the
    model's total downsampling factor (8 for RDUNet) for even shards at every
    scale.  The pure-DP analog is ``shard_batch``; agreement with it is
    asserted in tests/test_sharding.py.
    """
    return NamedSharding(mesh, P(None, axis))


def put_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device_put a host batch (pytree of arrays) with batch-dim sharding."""
    sh = shard_batch(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def put_replicated(tree, mesh: Mesh):
    """Device_put a pytree fully replicated over the mesh."""
    sh = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_sharded(tree, shardings):
    """Device_put a pytree with per-leaf NamedShardings, multi-process-safe.

    Single-process: plain ``device_put``.  Multi-process (pods):
    ``jax.device_put`` cannot target devices this process does not own, so
    each global array is assembled per-shard via ``make_array_from_callback``
    from the (process-identical) host value — every process materializes only
    its own shards.  Leaves already carrying their target sharding pass
    through untouched — essential multi-process, where such arrays are not
    host-readable.  Shared by `fsdp.put_fsdp` and `tp.put_tp`.
    """
    if jax.process_count() > 1:

        def put(x, s):
            if getattr(x, "sharding", None) == s:
                return x
            a = np.asarray(x)
            return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])

    else:

        def put(x, s):
            return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, tree, shardings)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bootstrap: ``jax.distributed.initialize`` from args or environment.

    The TPU-pod analog of torch's ``init_process_group`` (the reference never has
    one — single device, job.ssh:5-10).  Reads ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` when args are None; returns True if
    initialization ran.  No-ops (returns False) when no coordinator is configured —
    on Cloud TPU pods created with the standard runtime, plain
    ``jax.distributed.initialize()`` autodetects instead; pass
    ``coordinator_address='auto'`` to request that.  MUST be called before the first
    ``jax.devices()`` touch; safe to call twice (second call is a no-op).
    """
    import os

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return True
    kwargs = {}
    if coordinator_address != "auto":
        kwargs["coordinator_address"] = coordinator_address
        if num_processes is None:
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        if process_id is None:
            process_id = int(os.environ["JAX_PROCESS_ID"])
        kwargs.update(num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return True


def make_global_batch(x, sharding: NamedSharding):
    """Build a (possibly multi-host) global array from a host-resident batch.

    Single-process: a plain ``device_put`` (fast path).  Multi-process: every
    process holds the full host batch (the loaders are deterministic per epoch,
    so all processes fetch identical batches) and each contributes exactly the
    shards its addressable devices own via ``make_array_from_callback`` —
    correct for any device order in the mesh.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    # return the numpy slice directly: wrapping it in jnp.asarray would stage
    # every shard through the default device before its copy to the owning one
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def local_batch_rows(sharding: NamedSharding, n_rows: int):
    """Global batch-dim rows owned by THIS process's addressable devices.

    Returns a sorted list of row indices (the union of the dim-0 slices of every
    addressable device under ``sharding`` for a batch of ``n_rows``).  This is
    what lets a multi-host input pipeline fetch/decode only O(global_batch /
    n_processes) samples per host instead of the full global batch (VERDICT r2
    gap #4): the loader gathers exactly these rows and
    ``make_global_batch_from_local`` assembles the global array from them.
    """
    spec0 = sharding.spec[0] if len(sharding.spec) else None
    row_sharding = NamedSharding(sharding.mesh, P(spec0))
    idx_map = row_sharding.addressable_devices_indices_map((n_rows,))
    rows = set()
    for idx in idx_map.values():
        sl = idx[0]
        rows.update(range(sl.start or 0, n_rows if sl.stop is None else sl.stop))
    return sorted(rows)


def make_global_batch_from_local(x_local, rows, n_global: int, sharding: NamedSharding):
    """Assemble a global array when this process holds only its own rows.

    ``x_local``: host array of shape (len(rows), ...) holding the rows returned
    by :func:`local_batch_rows` in that order.  Each addressable shard's callback
    slices out of ``x_local`` by translated position — no process ever
    materializes the full global batch.
    """
    x_local = np.asarray(x_local)
    pos = {r: i for i, r in enumerate(rows)}
    shape = (n_global,) + x_local.shape[1:]

    def cb(idx):
        sl = idx[0]
        sel = [pos[r] for r in range(sl.start or 0,
                                     n_global if sl.stop is None else sl.stop)]
        want = np.asarray(sel)
        # contiguous fast path: a view instead of a fancy-index copy
        if len(want) and np.all(np.diff(want) == 1):
            block = x_local[want[0] : want[-1] + 1]
        else:
            block = x_local[want]
        return block[(slice(None),) + tuple(idx[1:])]

    return jax.make_array_from_callback(shape, sharding, cb)


def all_processes_mean(x):
    """Mean of a per-process scalar/array across processes (eval metric reduction).

    Single-process: identity.  Multi-process: ``process_allgather`` + mean — the
    ``psum``-outside-jit analog for host-side metrics.
    """
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.mean(np.asarray(gathered), axis=0)
