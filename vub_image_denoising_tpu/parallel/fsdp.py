"""FSDP-style (ZeRO) parameter/optimizer sharding over the data axis.

Greenfield TPU-scaling component (SURVEY.md §2.0 — the reference is strictly
single-device, RDUNet_model.py:263-266 just picks one cuda/mps device).  For the
166M-parameter RDUNet-128 flagship, replicating params + f32 Adam moments costs
~2 GB of HBM per chip; at pod scale that replication buys nothing.  The standard
JAX recipe applies: give every parameter (and its optimizer-state moments) a
``NamedSharding`` that splits one dimension across the ``data`` mesh axis, keep
the batch data-parallel, and let XLA's SPMD partitioner insert the all-gathers
(params into each layer) and reduce-scatters (grads out of the backward) over
ICI — no hand-written collectives.

The leaf rule mirrors what t5x/maxtext-style libraries do for conv nets:
shard the LARGEST dimension divisible by the axis size (for HWIO conv kernels
that is almost always O, the output-channel dim); leave small or indivisible
leaves (biases, PReLU alphas, schedule counters) replicated.  Optimizer moments
get the same spec as their parameter because the rule is a pure function of the
leaf shape.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import put_sharded


def fsdp_spec_for_shape(shape, n_shards: int, min_shard_elems: int = 1024):
    """PartitionSpec for one leaf: shard the largest dim divisible by
    ``n_shards``; replicate leaves that are small or have no divisible dim."""
    if n_shards <= 1 or int(np.prod(shape, dtype=np.int64)) < min_shard_elems:
        return P()
    divisible = [d for d, s in enumerate(shape) if s % n_shards == 0 and s > 0]
    if not divisible:
        return P()
    best = max(divisible, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[best] = "data"
    return P(*spec)


def fsdp_shardings(tree, mesh: Mesh, min_shard_elems: int = 1024):
    """Per-leaf NamedShardings for a pytree under the mesh's ``data`` axis."""
    n = mesh.shape["data"]

    def one(leaf):
        shape = np.shape(leaf)
        return NamedSharding(mesh, fsdp_spec_for_shape(shape, n, min_shard_elems))

    return jax.tree_util.tree_map(one, tree)


def put_fsdp(tree, mesh: Mesh, min_shard_elems: int = 1024):
    """Device_put a pytree with FSDP shardings (replicated where indivisible).

    Multi-process placement semantics live in `mesh.put_sharded` (each process
    materializes only its own shards; born-sharded leaves pass through)."""
    return put_sharded(tree, fsdp_shardings(tree, mesh, min_shard_elems))


def init_fsdp_state(create_fn, mesh: Mesh, *args, min_shard_elems: int = 1024):
    """Run a state-initializer with every output leaf born ALREADY sharded.

    ``jax.jit(create_fn, out_shardings=<fsdp specs>)`` lets XLA place each
    param / optimizer-moment leaf directly into its FSDP shard, so peak HBM at
    init is the SHARDED footprint — the full replicated params + f32 Adam
    moments are never materialized on one device (for models whose replicated
    state exceeds a chip's HBM, init would otherwise OOM before training ever
    started).  Under ``jax.disable_jit()`` (tests/dryruns use eager init for
    XLA-CPU compile speed) out_shardings is ignored and the caller's
    ``put_fsdp`` pass reshards after the fact."""
    shapes = jax.eval_shape(create_fn, *args)
    n = mesh.shape["data"]
    out_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, fsdp_spec_for_shape(s.shape, n, min_shard_elems)),
        shapes,
    )
    return jax.jit(create_fn, out_shardings=out_sh)(*args)


def sharded_fraction(tree) -> float:
    """Diagnostic: fraction of the tree's elements whose arrays are actually
    split across >1 device (0.0 = fully replicated)."""
    total = 0
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        size = int(np.prod(np.shape(leaf), dtype=np.int64))
        total += size
        sh = getattr(leaf, "sharding", None)
        if sh is not None and not sh.is_fully_replicated:
            sharded += size
    return sharded / total if total else 0.0
