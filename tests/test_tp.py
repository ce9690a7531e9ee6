"""Channel tensor-parallelism (parallel/tp.py) on the 8-device virtual CPU mesh.

TP splits each layer's compute over a ``model`` axis (conv kernels sharded on
output channels; GSPMD inserts the collectives) — the multi-chip latency path
for batches too small to shard over ``data``.  Parity vs the replicated
single-device run is the correctness bar, same as FSDP/spatial in
test_sharding.py.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vub_image_denoising_tpu.models import RDUNet
from vub_image_denoising_tpu.parallel import make_mesh, sharded_fraction
from vub_image_denoising_tpu.parallel.mesh import replicate, shard_batch
from vub_image_denoising_tpu.parallel.tp import (
    make_tp_mesh,
    put_tp,
    tp_spec_for_shape,
)


def test_tp_spec_rule():
    """Leaf rule: last dim (output channels) first, input channels as the
    partial-sum fallback, rank-1/small/indivisible leaves replicated."""
    assert tp_spec_for_shape((3, 3, 64, 128), 8) == P(None, None, None, "model")
    # O indivisible, I divisible -> input-channel sharding (GSPMD psums)
    assert tp_spec_for_shape((3, 3, 64, 3), 8) == P(None, None, "model", None)
    # bias / PReLU alpha: replicated
    assert tp_spec_for_shape((128,), 8) == P()
    # nothing divisible -> replicated
    assert tp_spec_for_shape((3, 3, 5, 7), 8) == P()
    # single shard -> replicated
    assert tp_spec_for_shape((3, 3, 64, 128), 1) == P()


def test_tp_forward_matches_single_device():
    """Channel-sharded forward must equal the unsharded one: kernels split on
    O over 8 devices, input replicated, GSPMD handles the dense-concat chains."""
    model = RDUNet(channels=3, base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x[:1])
    y_ref = jax.jit(model.apply)(params, x)

    mesh = make_tp_mesh()  # ("data": 1, "model": 8)
    tp_params = put_tp(params, mesh)
    assert sharded_fraction(tp_params) > 0.9, "TP left most params replicated"
    xr = jax.device_put(x, replicate(mesh))
    y_tp = jax.jit(model.apply)(tp_params, xr)
    np.testing.assert_allclose(
        np.asarray(y_tp), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_tp_diffusion_sampler_matches_single_device():
    """The T-step improved sampler (a jitted lax.scan over 2N-batched RDUNet_T
    forwards) must run unchanged with channel-sharded params — covers the time
    embedding's dense layers under TP and the denoise CLI's
    ``--arch diffusion --tensor-parallel`` path."""
    from vub_image_denoising_tpu.diffusion import InterpolationDiffusion
    from vub_image_denoising_tpu.models import RDUNetT

    unet = RDUNetT(base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = unet.init(jax.random.PRNGKey(1), x, jnp.zeros((2,)))
    diff = InterpolationDiffusion(timesteps=4)
    sample = lambda p, n: diff.improved_sampling(unet.apply, p, n)
    y_ref = jax.jit(sample)(params, x)

    mesh = make_tp_mesh()
    tp_params = put_tp(params, mesh)
    assert sharded_fraction(tp_params) > 0.9
    y_tp = jax.jit(sample)(tp_params, jax.device_put(x, replicate(mesh)))
    np.testing.assert_allclose(
        np.asarray(y_tp), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_tp_train_step_matches_replicated():
    """param_sharding='tp' on the supervised trainer: the jitted step runs with
    XLA-inserted model-axis collectives, the state stays channel-sharded across
    steps, and params match the single-device run.  Also covers the dp x tp
    composition on a ("data": 2, "model": 4) mesh."""
    from vub_image_denoising_tpu.train import SupervisedTrainer

    model = RDUNet(channels=3, base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))

    def run(param_sharding, mesh=None):
        tr = SupervisedTrainer(model, lr=1e-3, accumulation_steps=1,
                               mesh=mesh, param_sharding=param_sharding)
        state = tr.init(jax.random.PRNGKey(2), jnp.zeros((4, 16, 16, 3)),
                        steps_per_epoch=1)
        frac = sharded_fraction(state.params)
        xb = jax.device_put(x, shard_batch(tr.mesh))
        yb = jax.device_put(y, shard_batch(tr.mesh))
        state, loss = tr._jit_step(state, xb, yb)
        return float(loss), jax.device_get(state.params), frac, state

    loss_r, params_r, frac_r, _ = run("replicated",
                                      mesh=make_mesh(jax.devices()[:1]))
    assert frac_r == 0.0

    # dp x tp: batch over 2-way data, channels over 4-way model
    loss_t, params_t, frac_t, state_t = run("tp", mesh=make_tp_mesh(n_data=2))
    assert frac_t > 0.5, f"TP left {1 - frac_t:.0%} of params replicated"
    np.testing.assert_allclose(loss_t, loss_r, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_t),
                    jax.tree_util.tree_leaves(params_r)):
        # Adam step-1 amplifies fp noise on near-zero grads (see
        # test_sharding.py) — compare at the same tolerance
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    # the updated state must STAY sharded (no silent gather-to-replicated)
    assert sharded_fraction(state_t.params) > 0.5
    assert sharded_fraction(state_t.opt_state) > 0.3
