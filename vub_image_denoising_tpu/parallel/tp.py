"""Channel tensor-parallelism over a ``model`` mesh axis.

Greenfield TPU-scaling component (SURVEY.md §2.0 — the reference is strictly
single-device, RDUNet_model.py:263-266).  Data parallelism (`mesh.py`) and
spatial partitioning (`shard_spatial`, `tiles.py`) split the *activations*;
FSDP (`fsdp.py`) splits parameter *storage* but still all-gathers full weights
into every layer.  Tensor parallelism splits the *compute* of each layer:
conv kernels are sharded along their output-channel dim (HWIO → O) over a
``model`` axis, so each device computes only its slice of every layer's output
channels.  XLA's SPMD partitioner propagates the channel sharding through the
elementwise ops (PReLU, adds, concats) and inserts the halo-free collectives
(all-gathers where a following conv consumes all input channels, psums where
an input-channel-sharded conv produces partial sums) — no hand-written
collectives, exactly the Megatron recipe expressed as GSPMD annotations.

When this pays: multi-chip *latency* — a batch too small to shard over
``data`` (batch-1 interactive denoising, the T=20 diffusion sampler at the
batch-8 sweet spot) can still use every chip by splitting channels instead of
samples.  The spatial-tile path (`tiles.py`) is the alternative for large
images; TP also covers small images, where an 8-way H split would leave tiles
thinner than the receptive field.  Composes with data parallelism on a 2-D
("data", "model") mesh: batch over ``data``, channels over ``model``.

The leaf rule is shape-based, mirroring `fsdp.py`:
- rank ≥ 2 (conv HWIO / conv_t HWIO / dense (in, out)): shard the LAST dim
  (output channels) when divisible by the axis size, else the second-to-last
  (input channels — GSPMD then inserts the partial-sum psum), else replicate.
- rank 1 (bias, PReLU alpha) and small leaves: replicated (GSPMD broadcasts
  them into the channel-sharded elementwise ops for free).

RDUNet at base_filters ≥ 8·axis_size shards every interior conv; the 3-channel
input/output convs stay replicated (their FLOPs are negligible).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import put_sharded


def tp_spec_for_shape(shape, n_shards: int, axis: str = "model",
                      min_shard_elems: int = 1024):
    """PartitionSpec for one leaf: shard output channels (last dim) over the
    ``model`` axis; fall back to input channels; replicate rank-1/small/
    indivisible leaves."""
    if n_shards <= 1 or len(shape) < 2:
        return P()
    if int(np.prod(shape, dtype=np.int64)) < min_shard_elems:
        return P()
    spec = [None] * len(shape)
    if shape[-1] % n_shards == 0 and shape[-1] > 0:
        spec[-1] = axis
    elif shape[-2] % n_shards == 0 and shape[-2] > 0:
        spec[-2] = axis
    else:
        return P()
    return P(*spec)


def tp_shardings(tree, mesh: Mesh, axis: str = "model",
                 min_shard_elems: int = 1024):
    """Per-leaf NamedShardings for a pytree under the mesh's ``model`` axis."""
    n = mesh.shape[axis]

    def one(leaf):
        shape = np.shape(leaf)
        return NamedSharding(
            mesh, tp_spec_for_shape(shape, n, axis, min_shard_elems)
        )

    return jax.tree_util.tree_map(one, tree)


def put_tp(tree, mesh: Mesh, axis: str = "model", min_shard_elems: int = 1024):
    """Device_put a pytree with tensor-parallel shardings.

    Multi-process-safe like `fsdp.put_fsdp`: global arrays are assembled
    per-shard via ``make_array_from_callback`` when this process does not own
    every device; leaves already carrying their target sharding pass through.
    """
    return put_sharded(tree, tp_shardings(tree, mesh, axis, min_shard_elems))


def init_tp_state(create_fn, mesh: Mesh, *args, axis: str = "model",
                  min_shard_elems: int = 1024):
    """Run a state-initializer with every output leaf born channel-sharded
    (``jit`` + ``out_shardings``), mirroring `fsdp.init_fsdp_state`: peak HBM
    at init is the sharded footprint.  Under ``jax.disable_jit()`` the caller's
    `put_tp` pass reshards after the fact."""
    shapes = jax.eval_shape(create_fn, *args)
    n = mesh.shape[axis]
    out_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(
            mesh, tp_spec_for_shape(s.shape, n, axis, min_shard_elems)
        ),
        shapes,
    )
    return jax.jit(create_fn, out_shardings=out_sh)(*args)


def make_tp_mesh(n_data: Optional[int] = None, devices=None) -> Mesh:
    """A ("data", "model") mesh: ``n_data``-way data parallel (default 1 —
    pure TP), model parallel over the rest.  The trainers build this when
    ``param_sharding='tp'`` and no mesh was given."""
    devices = list(devices if devices is not None else jax.devices())
    n_data = 1 if n_data is None else n_data
    if len(devices) % n_data:
        raise ValueError(f"{len(devices)} devices not divisible by n_data={n_data}")
    arr = np.asarray(devices).reshape(n_data, len(devices) // n_data)
    return Mesh(arr, ("data", "model"))
