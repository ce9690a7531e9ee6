"""Multi-host plumbing: init_distributed gating, global-batch construction,
cross-process metric reduction.  Real multi-process runs need a pod; these tests
pin the single-process fast paths and drive the multi-process code paths on one
process (where they must degrade to identities).
"""

import os
import jax
import jax.numpy as jnp
import numpy as np

from vub_image_denoising_tpu.parallel.mesh import (
    all_processes_mean,
    init_distributed,
    local_batch_rows,
    make_global_batch,
    make_global_batch_from_local,
    make_mesh,
    shard_batch,
)


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False


def test_make_global_batch_single_process_matches_device_put():
    mesh = make_mesh()
    sh = shard_batch(mesh)
    x = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    got = make_global_batch(x, sh)
    ref = jax.device_put(x, sh)
    assert got.sharding == ref.sharding
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_make_global_batch_callback_path(monkeypatch):
    # force the multi-process branch on one process: make_array_from_callback must
    # assemble the identical global array from per-shard callbacks
    mesh = make_mesh()
    sh = shard_batch(mesh)
    x = np.random.RandomState(0).randn(8, 4, 4, 3).astype(np.float32)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    got = make_global_batch(x, sh)
    np.testing.assert_array_equal(np.asarray(got), x)
    shard_shapes = {tuple(s.data.shape) for s in got.addressable_shards}
    n = mesh.devices.size
    assert shard_shapes == {(8 // n, 4, 4, 3)}


def test_local_rows_cover_all_devices_and_assembly_matches():
    # single process: every device is addressable, so the local rows are ALL
    # rows and the from-local assembly must equal the full-fetch assembly
    mesh = make_mesh()
    sh = shard_batch(mesh)
    n = max(8, mesh.devices.size)
    rows = local_batch_rows(sh, n)
    assert rows == list(range(n))
    x = np.random.RandomState(1).randn(n, 4, 3).astype(np.float32)
    got = make_global_batch_from_local(x, rows, n, sh)
    np.testing.assert_array_equal(np.asarray(got), x)
    assert got.sharding == sh


def test_local_rows_subset_assembly(monkeypatch):
    # feed a PERMUTED local subset covering all shards: the callback must place
    # every row by translated position, not assume the identity layout
    mesh = make_mesh()
    sh = shard_batch(mesh)
    n = max(8, mesh.devices.size)
    x = np.random.RandomState(2).randn(n, 5).astype(np.float32)
    rows = list(range(n))
    perm = np.random.RandomState(3).permutation(n)
    got = make_global_batch_from_local(x[perm], [int(r) for r in perm], n, sh)
    np.testing.assert_array_equal(np.asarray(got), x)


def test_loader_sharded_fetch_matches_full_fetch(monkeypatch):
    # pretend-2-process run on one process: VUB_SHARDED_FETCH=1 must yield
    # byte-identical device batches to the full-fetch path, incl. tail trimming
    from vub_image_denoising_tpu.data.loader import PatchLoader

    class DS:
        channels = 3

        def __len__(self):
            return 13

        def __getitem__(self, i):
            rng = np.random.RandomState(100 + i)
            return rng.randint(0, 255, (6, 6, 3)).astype(np.uint8), float(i)

    mesh = make_mesh()
    sh = shard_batch(mesh)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    out = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("VUB_SHARDED_FETCH", mode)
        loader = PatchLoader(DS(), batch_size=8, shuffle=True, sharding=sh,
                             drop_last=False, seed=11)
        out[mode] = [[np.asarray(c) for c in b] for b in loader]
    assert len(out["1"]) == len(out["0"])
    for b1, b0 in zip(out["1"], out["0"]):
        for c1, c0 in zip(b1, b0):
            np.testing.assert_array_equal(c1, c0)


def test_all_processes_mean_identity_and_gather_path(monkeypatch):
    x = np.asarray([1.5, 2.5], np.float32)
    np.testing.assert_array_equal(all_processes_mean(x), x)
    # multi-process branch with a faked 2-process allgather: mean over axis 0
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        multihost_utils, "process_allgather", lambda v: np.stack([v, v + 1.0])
    )
    np.testing.assert_allclose(np.asarray(all_processes_mean(x)), x + 0.5)


def test_loader_uses_global_batch_construction(monkeypatch, tmp_path):
    from PIL import Image

    from vub_image_denoising_tpu.data import FolderPatchDataset, PatchLoader

    arr = np.random.RandomState(0).randint(0, 256, (512, 1024, 3), np.uint8)
    Image.fromarray(arr).save(tmp_path / "img.png")
    ds = FolderPatchDataset(str(tmp_path), noise_levels=[25, 50], use_rgb=True)
    mesh = make_mesh()
    n = mesh.devices.size
    loader = PatchLoader(ds, batch_size=max(n, 4), sharding=shard_batch(mesh))
    monkeypatch.setattr(jax, "process_count", lambda: 2)  # exercise callback path
    clean, sigma = next(iter(loader))
    assert {s.data.shape[0] for s in clean.addressable_shards} == {max(n, 4) // n}
    assert np.isfinite(np.asarray(sigma)).all()


def test_two_process_end_to_end(tmp_path):
    """REAL 2-process jax.distributed run (gloo collectives on CPU): global mesh,
    make_global_batch from host data, sharded forward, cross-process metric mean.
    Subprocesses drop the axon sitecustomize (it pre-imports jax, pinning the
    backend before jax.distributed can attach; real TPU VMs have no such shim)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(
        JAX_PLATFORMS="cpu",
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES="2",
    )
    env.pop("XLA_FLAGS", None)  # worker sets jax_num_cpu_devices itself
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "multihost_cpu_demo.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script], env={**env, "JAX_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    # generous: two jax subprocesses compiling on a 1-core host under full-suite
    # load (observed >20 min when a TPU training job shares the host); on timeout
    # kill both so a flake doesn't leak CPU-hungry processes into later tests
    try:
        outs = [p.communicate(timeout=1800)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        outs = [p.communicate()[0] for p in procs]
        raise AssertionError(
            "2-process demo exceeded 30 min (host overloaded?): "
            + " | ".join(o[-500:] for o in outs if o)
        )
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert any("proc 0/2" in o and "OK" in o for o in outs), outs
    assert any("proc 1/2" in o and "OK" in o for o in outs), outs
    # the global mean must agree across processes
    import re

    vals = {m.group(1) for o in outs for m in [re.search(r"global\|y\|=([0-9.]+)", o)] if m}
    assert len(vals) == 1, outs
    # the FSDP train step ran on both processes and produced the same loss
    fsdp = {m.group(1) for o in outs for m in [re.search(r"fsdp_loss=([0-9.]+)", o)] if m}
    assert len(fsdp) == 1, outs
