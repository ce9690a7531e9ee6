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
import jax.numpy as jnp

jax.config.update("jax_num_cpu_devices", 4)

from vub_image_denoising_tpu.parallel.mesh import (  # noqa: E402
    all_processes_mean,
    init_distributed,
    local_batch_rows,
    make_global_batch,
    make_global_batch_from_local,
    make_mesh,
    put_replicated,
    shard_batch,
)


class _SyntheticDS:
    """Tiny deterministic dataset for the loader fetch-parity check."""

    channels = 3

    def __init__(self, n):
        # deliberately not a multiple of the batch: exercises tail trimming
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = __import__("numpy").random.RandomState(1000 + i)
        return rng.randint(0, 255, (8, 8, 3)).astype("uint8"), float(i)


def _shards_equal(a, b):
    import numpy as np

    sa = sorted(a.addressable_shards, key=lambda s: str(s.index))
    sb = sorted(b.addressable_shards, key=lambda s: str(s.index))
    assert len(sa) == len(sb) and all(x.index == y.index for x, y in zip(sa, sb))
    for x, y in zip(sa, sb):
        np.testing.assert_array_equal(np.asarray(x.data), np.asarray(y.data))


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

    # --- per-process sharded input fetch (VERDICT r2 #3) ------------------
    # (a) helper level: local rows are O(global/n_processes) and the assembled
    # global array is byte-identical to the full-fetch one
    rows = local_batch_rows(sh, batch)
    assert len(rows) == batch // nproc, (rows, batch, nproc)
    gx_local = make_global_batch_from_local(x[rows], rows, batch, sh)
    _shards_equal(gx_local, gx)

    # (b) loader level: VUB_SHARDED_FETCH=1 (each process fetches only its
    # rows) must yield batches byte-identical to the full-fetch path, incl.
    # the non-divisible 13-sample tail (trimmed to a shard multiple)
    from vub_image_denoising_tpu.data.loader import PatchLoader

    ndev = jax.device_count()
    ds = _SyntheticDS(ndev + ndev // 2 + 1)  # one full batch + a sub-shard tail
    batches = {}
    for mode in ("1", "0"):
        os.environ["VUB_SHARDED_FETCH"] = mode
        loader = PatchLoader(ds, batch_size=ndev, shuffle=True, sharding=sh,
                             drop_last=False, seed=7)
        assert len(loader) == 1  # __len__ must agree with the tail-skip policy
        batches[mode] = list(loader)
    assert len(batches["1"]) == len(batches["0"]) == 1, {
        k: len(v) for k, v in batches.items()
    }  # the (ndev//2+1)-sample tail < ndev shards is skipped on both paths
    for b1, b0 in zip(batches["1"], batches["0"]):
        for c1, c0 in zip(b1, b0):
            _shards_equal(c1, c0)

    # --- FSDP (ZeRO) param/optimizer sharding across BOTH processes --------
    # put_fsdp assembles the sharded global params via make_array_from_callback
    # (device_put cannot target the other process's devices); the jitted train
    # step then runs with XLA-inserted all-gathers/reduce-scatters over the
    # process boundary.
    from vub_image_denoising_tpu.parallel import sharded_fraction
    from vub_image_denoising_tpu.train import SupervisedTrainer

    fsdp_model = RDUNet(channels=3, base_filters=8)
    trainer = SupervisedTrainer(
        fsdp_model, lr=1e-3, accumulation_steps=1, mesh=mesh,
        param_sharding="fsdp",
    )
    with jax.disable_jit():
        state = trainer.init(jax.random.PRNGKey(3), x[:1], steps_per_epoch=1)
    frac = sharded_fraction(state.params)
    assert frac > 0.5, f"FSDP left {1 - frac:.0%} of params replicated"

    # the jitted born-sharded init path (init_fsdp_state: jit + out_shardings)
    # across the PROCESS boundary — the trainer init above uses the eager
    # fallback (disable_jit, for XLA-CPU compile speed), so prove the jitted
    # path cross-process on a toy tree: every output leaf must land directly
    # in its FSDP shard spanning both processes' devices.
    from vub_image_denoising_tpu.parallel.fsdp import init_fsdp_state

    toy = init_fsdp_state(
        lambda k: {"w": jax.random.normal(k, (4, 4, 16, 64)),
                   "b": jnp.zeros((8,))},
        mesh, jax.random.PRNGKey(11),
    )
    assert not toy["w"].sharding.is_fully_replicated
    assert len(toy["w"].sharding.device_set) == jax.device_count()
    assert sharded_fraction(toy) > 0.9
    noisy = make_global_batch(
        np.asarray(x + 0.01 * np.random.RandomState(4).randn(*x.shape),
                   np.float32), sh
    )
    state, fsdp_loss = trainer._jit_step(state, noisy, gx)
    fsdp_loss = float(fsdp_loss)
    assert np.isfinite(fsdp_loss)
    assert sharded_fraction(state.params) > 0.5, "state lost its FSDP sharding"

    # checkpoint FROM the cross-process FSDP state: the .pth gathers are
    # collectives (host_replicated_copy, process 0 writes) and the orbax
    # sidecar saves SHARD-NATIVE (each process writes only its shards); then
    # every process resumes into a replicated trainer (orbax reshards on
    # restore) and must see identical params
    import shutil

    from jax.experimental import multihost_utils

    from vub_image_denoising_tpu.utils import checkpoint as ckpt_io

    ckdir = "/tmp/vub_mh_fsdp_ckpt"
    if jax.process_index() == 0:
        shutil.rmtree(ckdir, ignore_errors=True)
    multihost_utils.sync_global_devices("ckdir_clean")
    trainer.checkpoint_dir = ckdir
    trainer.checkpoint_every = 1
    path = trainer.maybe_checkpoint(state, epoch=0)
    multihost_utils.sync_global_devices("ckpt_written")
    rep = SupervisedTrainer(fsdp_model, lr=1e-3, accumulation_steps=1, mesh=mesh)
    rstate = rep.init(jax.random.PRNGKey(5), x[:1], steps_per_epoch=1)
    rstate, epoch = rep.load_checkpoint(rstate, path)
    assert epoch == 1
    want = ckpt_io.host_replicated_copy(state.params)
    got = jax.device_get(rstate.params)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # --- pipeline-parallel sampling with stages spanning BOTH processes ----
    # the T-step sampler chunks over a ("stage",) mesh of all global devices
    # (4 per process); microbatches ppermute across the process boundary —
    # the DCN analog of inter-host pipeline hand-off on a pod.
    from vub_image_denoising_tpu.diffusion import InterpolationDiffusion
    from vub_image_denoising_tpu.models.rdunet import RDUNetT
    from vub_image_denoising_tpu.parallel import make_pp_mesh, pipelined_sampling

    unet = RDUNetT(base_filters=4)
    xs_small = jnp.asarray(np.asarray(x[:4, :8, :8, :], np.float32))
    with jax.disable_jit():
        tparams = unet.init(jax.random.PRNGKey(6), xs_small[:1], jnp.zeros((1,)))
    diff = InterpolationDiffusion(timesteps=jax.device_count())
    y_ref = np.asarray(
        jax.jit(lambda p, n: diff.improved_sampling(unet.apply, p, n))(
            tparams, xs_small
        )
    )  # process-local reference on this process's own devices
    pp_mesh = make_pp_mesh()  # depth = all global devices
    y_pp = pipelined_sampling(
        diff, unet.apply, tparams, xs_small, pp_mesh, microbatch=2
    )
    y_pp_host = np.asarray(ckpt_io.host_replicated_copy(y_pp))
    np.testing.assert_allclose(y_pp_host, y_ref, rtol=1e-5, atol=1e-5)

    print(
        f"proc {jax.process_index()}/{nproc}: devices {len(jax.devices())} "
        f"out {y.shape} local|y|={local_mean:.5f} global|y|={global_mean:.5f} "
        f"sharded-fetch rows/proc {len(rows)} fsdp_loss={fsdp_loss:.6f} "
        f"pp_depth={pp_mesh.devices.size} OK",
        flush=True,
    )


if __name__ == "__main__":
    main()
