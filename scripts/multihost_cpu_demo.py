"""Two-process multi-host demo/validation on CPU (no pod required).

Worker for a real ``jax.distributed`` run: each process owns 4 virtual CPU
devices of one 8-device global mesh, assembles a global batch from host data
(`make_global_batch`), runs a sharded RDUNet forward, and reduces a host-side
metric across processes (`all_processes_mean`).  The TPU-pod analog maps 1:1 —
only the device kind changes.

Launch (also done by tests/test_multihost.py::test_two_process_end_to_end):

    export JAX_PLATFORMS=cpu JAX_COORDINATOR_ADDRESS=127.0.0.1:<port> \
           JAX_NUM_PROCESSES=2
    JAX_PROCESS_ID=0 python scripts/multihost_cpu_demo.py &
    JAX_PROCESS_ID=1 python scripts/multihost_cpu_demo.py

In THIS container the axon sitecustomize pre-imports jax, which pins the
backend before ``jax.distributed`` can attach — launch with
``env -u PALLAS_AXON_POOL_IPS`` here.  Real TPU VMs have no such shim.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_num_cpu_devices", 4)

from vub_image_denoising_tpu.parallel.mesh import (  # noqa: E402
    all_processes_mean,
    init_distributed,
    make_global_batch,
    make_mesh,
    put_replicated,
    shard_batch,
)


def main():
    assert init_distributed(), "set JAX_COORDINATOR_ADDRESS/_NUM_PROCESSES/_PROCESS_ID"
    import numpy as np

    nproc = jax.process_count()
    assert nproc > 1, "expected a multi-process launch"
    mesh = make_mesh()  # global devices; shards per-process automatically
    sh = shard_batch(mesh)

    # every process holds the same host batch (deterministic loaders); each
    # contributes only its addressable shards
    batch = 2 * mesh.devices.size
    x = np.arange(batch * 16 * 16 * 3, dtype=np.float32).reshape(batch, 16, 16, 3)
    x = x / x.max() * 2.0 - 1.0
    gx = make_global_batch(x, sh)
    assert gx.shape == x.shape

    # sharded model forward over the global mesh (params replicated)
    from vub_image_denoising_tpu.models import RDUNet

    model = RDUNet(channels=3, base_filters=4)
    with jax.disable_jit():
        params = model.init(jax.random.PRNGKey(0), x[:1])
    params = put_replicated(params, mesh)
    y = jax.jit(model.apply)(params, gx)
    local_mean = float(jax.numpy.abs(y).mean())

    global_mean = float(all_processes_mean(np.float32(local_mean)))
    print(
        f"proc {jax.process_index()}/{nproc}: devices {len(jax.devices())} "
        f"out {y.shape} local|y|={local_mean:.5f} global|y|={global_mean:.5f} OK",
        flush=True,
    )


if __name__ == "__main__":
    main()
