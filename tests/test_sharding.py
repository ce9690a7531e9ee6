"""Multi-device data-parallel tests on the 8-device virtual CPU mesh (conftest.py)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vub_image_denoising_tpu.models import RDUNet
from vub_image_denoising_tpu.parallel import make_mesh, replicate, shard_batch
from vub_image_denoising_tpu.parallel.mesh import put_batch, put_replicated
from vub_image_denoising_tpu.train import SupervisedTrainer


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_sharded_train_step_matches_single_device():
    """The data-parallel step must be numerically identical to single-device."""
    model = RDUNet(channels=3, base_filters=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))

    def run(mesh_devices):
        mesh = make_mesh(mesh_devices)
        trainer = SupervisedTrainer(model, lr=1e-3, accumulation_steps=1, mesh=mesh)
        state = trainer.init(jax.random.PRNGKey(2), jnp.zeros((8, 16, 16, 3)), steps_per_epoch=1)
        xb = jax.device_put(x, shard_batch(mesh))
        yb = jax.device_put(y, shard_batch(mesh))
        state, loss = trainer._jit_step(state, xb, yb)
        return float(loss), jax.device_get(state.params)

    loss8, params8 = run(jax.devices())
    loss1, params1 = run(jax.devices()[:1])
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    # Adam's g/sqrt(nu) at step 1 amplifies fp summation-order noise on near-zero
    # gradient elements, so params agree to ~1e-3*lr, not bitwise.
    for a, b in zip(jax.tree_util.tree_leaves(params8), jax.tree_util.tree_leaves(params1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    # the reduced gradients themselves must match tightly across mesh sizes
    def grads_on(mesh_devices):
        mesh = make_mesh(mesh_devices)
        params = model.init(jax.random.PRNGKey(2), x[:1])
        params = put_replicated(params, mesh)
        xb = jax.device_put(x, shard_batch(mesh))
        yb = jax.device_put(y, shard_batch(mesh))

        def loss_fn(p, xs, ys):
            return jnp.mean(jnp.abs(model.apply(p, xs) - ys))

        return jax.device_get(jax.jit(jax.grad(loss_fn))(params, xb, yb))

    g8 = grads_on(jax.devices())
    g1 = grads_on(jax.devices()[:1])
    for a, b in zip(jax.tree_util.tree_leaves(g8), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_batch_sharding_layout():
    mesh = make_mesh()
    x = jnp.zeros((16, 8, 8, 3))
    xs = jax.device_put(x, shard_batch(mesh))
    assert xs.sharding.spec == P("data")
    # each device holds 2 samples
    assert xs.addressable_shards[0].data.shape == (2, 8, 8, 3)


def test_patch_loader_sharding_fallback_on_indivisible_batch():
    """A batch that doesn't divide the mesh's data axis (e.g. 6 on 8 devices) must
    still load — the loader falls back to unsharded placement for it."""
    import numpy as np

    from vub_image_denoising_tpu.data import ArrayPatchDataset, PatchLoader

    n = 6  # not divisible by 8
    data = np.random.RandomState(0).randint(0, 255, (n, 8, 8, 3), np.uint8)
    ds = ArrayPatchDataset(data, data)
    mesh = make_mesh()
    loader = PatchLoader(ds, batch_size=n, sharding=shard_batch(mesh),
                         num_workers=1, drop_last=False)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0][0].shape[0] == n  # loaded despite the indivisible batch


def test_replicated_params():
    mesh = make_mesh()
    tree = {"w": jnp.ones((4, 4))}
    rep = put_replicated(tree, mesh)
    assert rep["w"].sharding.spec == P()
    assert len(rep["w"].addressable_shards) == 8


def test_fsdp_spec_rule():
    """Leaf rule: shard the largest divisible dim; replicate small/indivisible."""
    from vub_image_denoising_tpu.parallel.fsdp import fsdp_spec_for_shape

    # HWIO conv kernel: O (largest divisible dim) gets the axis
    assert fsdp_spec_for_shape((3, 3, 64, 128), 8) == P(None, None, None, "data")
    # I > O here -> I gets it
    assert fsdp_spec_for_shape((3, 3, 256, 128), 8) == P(None, None, "data", None)
    # small leaf -> replicated
    assert fsdp_spec_for_shape((8,), 8) == P()
    # no divisible dim -> replicated
    assert fsdp_spec_for_shape((5, 7, 9, 11111), 8) == P()
    # single device -> replicated
    assert fsdp_spec_for_shape((3, 3, 64, 128), 1) == P()


def test_init_fsdp_state_born_sharded():
    """init_fsdp_state must return leaves ALREADY carrying their FSDP sharding
    (jit out_shardings places them at init — the replicated full state is never
    materialized), matching fsdp_shardings' specs leaf-for-leaf."""
    from vub_image_denoising_tpu.parallel.fsdp import (
        fsdp_shardings, init_fsdp_state,
    )

    mesh = make_mesh()

    def create(key):
        return {
            "w": jax.random.normal(key, (3, 3, 64, 128)),  # shardable on O
            "b": jnp.zeros((8,)),  # small -> replicated
        }

    state = init_fsdp_state(create, mesh, jax.random.PRNGKey(0))
    want = fsdp_shardings(jax.eval_shape(create, jax.random.PRNGKey(0)), mesh)
    assert state["w"].sharding == want["w"]
    assert state["w"].sharding.spec == P(None, None, None, "data")
    assert state["b"].sharding.is_fully_replicated
    # and the values equal an eager init (out_shardings must not change math)
    np.testing.assert_allclose(
        np.asarray(state["w"]), np.asarray(create(jax.random.PRNGKey(0))["w"]),
        rtol=1e-6,
    )


def test_fsdp_train_step_matches_replicated():
    """FSDP-sharded params/opt-state: the train step (with the reference's
    gradient accumulation — a lax.scan over micro-batches against the sharded
    grad accumulator) compiles with XLA-inserted collectives, keeps the state
    sharded across steps, and the resulting params match the replicated
    (pure-DP) run."""
    from vub_image_denoising_tpu.parallel import sharded_fraction

    model = RDUNet(channels=3, base_filters=8)  # 8 channels -> shardable on 8 devices
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 16, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))

    def run(param_sharding):
        mesh = make_mesh()
        trainer = SupervisedTrainer(
            model, lr=1e-3, accumulation_steps=2, mesh=mesh,
            param_sharding=param_sharding,
        )
        state = trainer.init(
            jax.random.PRNGKey(2), jnp.zeros((16, 16, 16, 3)), steps_per_epoch=1
        )
        frac = sharded_fraction(state.params)
        xb = jax.device_put(x, shard_batch(mesh))
        yb = jax.device_put(y, shard_batch(mesh))
        state, loss = trainer._jit_step(state, xb, yb)
        state, loss = trainer._jit_step(state, xb, yb)
        return float(loss), jax.device_get(state.params), frac, state

    loss_f, params_f, frac_f, state_f = run("fsdp")
    loss_r, params_r, frac_r, _ = run("replicated")
    assert frac_r == 0.0
    assert frac_f > 0.5, f"FSDP left {1 - frac_f:.0%} of params replicated"
    np.testing.assert_allclose(loss_f, loss_r, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_f),
                    jax.tree_util.tree_leaves(params_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    # the updated state must STAY sharded (no silent gather-to-replicated)
    assert sharded_fraction(state_f.params) > 0.5
    assert sharded_fraction(state_f.opt_state) > 0.3


def test_fsdp_checkpoint_roundtrips_into_replicated_trainer(tmp_path):
    """Saving from an FSDP-sharded state must gather shards into a normal .pth
    that a replicated trainer resumes from exactly (params AND optax state)."""
    from vub_image_denoising_tpu.parallel import sharded_fraction

    model = RDUNet(channels=3, base_filters=8)
    mesh = make_mesh()
    fsdp = SupervisedTrainer(
        model, lr=1e-3, accumulation_steps=1, mesh=mesh, param_sharding="fsdp",
        checkpoint_every=1, checkpoint_dir=str(tmp_path),
    )
    state = fsdp.init(jax.random.PRNGKey(0), jnp.zeros((8, 16, 16, 3)),
                      steps_per_epoch=1)
    assert sharded_fraction(state.params) > 0.5
    path = fsdp.maybe_checkpoint(state, epoch=0)

    rep = SupervisedTrainer(model, lr=1e-3, accumulation_steps=1,
                            mesh=make_mesh())
    rstate = rep.init(jax.random.PRNGKey(9), jnp.zeros((8, 16, 16, 3)),
                      steps_per_epoch=1)
    rstate, epoch = rep.load_checkpoint(rstate, path)
    assert epoch == 1
    for a, b in zip(
        jax.tree_util.tree_leaves((state.params, state.opt_state)),
        jax.tree_util.tree_leaves((rstate.params, rstate.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fsdp_sidecar_restores_born_sharded(tmp_path):
    """The orbax sidecar is saved SHARD-NATIVE (no host gather) and an FSDP
    trainer resumes it born-sharded: restored leaves carry the FSDP sharding
    directly — the replicated full state is never materialized (the restore
    analog of init_fsdp_state's born-sharded init)."""
    from vub_image_denoising_tpu.parallel import sharded_fraction

    model = RDUNet(channels=3, base_filters=8)
    fsdp = SupervisedTrainer(
        model, lr=1e-3, accumulation_steps=1, mesh=make_mesh(),
        param_sharding="fsdp", checkpoint_every=1, checkpoint_dir=str(tmp_path),
    )
    state = fsdp.init(jax.random.PRNGKey(0), jnp.zeros((8, 16, 16, 3)),
                      steps_per_epoch=1)
    path = fsdp.maybe_checkpoint(state, epoch=0)

    fsdp2 = SupervisedTrainer(
        model, lr=1e-3, accumulation_steps=1, mesh=make_mesh(),
        param_sharding="fsdp",
    )
    s2 = fsdp2.init(jax.random.PRNGKey(7), jnp.zeros((8, 16, 16, 3)),
                    steps_per_epoch=1)
    s2, epoch = fsdp2.load_checkpoint(s2, path)
    assert epoch == 1
    assert sharded_fraction(s2.params) > 0.5, "restore lost the FSDP sharding"
    for a, b in zip(
        jax.tree_util.tree_leaves((state.params, state.opt_state)),
        jax.tree_util.tree_leaves((s2.params, s2.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_sharded_train_step_matches_batch_sharded():
    """Spatially-partitioned input (H split over the mesh, shard_spatial) must
    produce the same loss/params as the pure-DP batch sharding: XLA inserts the
    conv halo exchanges; the jitted step itself is unchanged.  This is the
    high-resolution training mode (one image larger than a device's HBM)."""
    from vub_image_denoising_tpu.parallel import shard_spatial

    model = RDUNet(channels=3, base_filters=4)
    # H=64: divisible by 8 shards x downsampling factor 8 -> even shards at
    # every scale
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))

    def run(devices, make_sharding):
        mesh = make_mesh(devices)
        trainer = SupervisedTrainer(model, lr=1e-3, accumulation_steps=1,
                                    mesh=mesh)
        state = trainer.init(jax.random.PRNGKey(2), jnp.zeros((2, 64, 64, 3)),
                             steps_per_epoch=1)
        xb = jax.device_put(x, make_sharding(mesh))
        yb = jax.device_put(y, make_sharding(mesh))
        state, loss = trainer._jit_step(state, xb, yb)
        return float(loss), jax.device_get(state.params)

    loss_s, params_s = run(jax.devices(), shard_spatial)  # H split 8 ways
    loss_b, params_b = run(jax.devices()[:1], shard_batch)  # single device
    np.testing.assert_allclose(loss_s, loss_b, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_s),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
