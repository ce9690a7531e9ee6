"""Fused inference engine vs flax forward (interpret-mode Pallas on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.models import RDUNet, RDUNetT
from vub_image_denoising_tpu.models.fused_apply import (
    prepare_fused_params,
    rdunet_apply_fused,
    rdunet_t_apply_fused,
)
from vub_image_denoising_tpu.nn.blocks import DenoisingBlock
from vub_image_denoising_tpu.ops.fused_block import fused_denoising_block, pad_block_params


def test_rdunet_fused_matches_flax():
    model = RDUNet(channels=3, base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    want = np.asarray(model.apply(variables, x))
    got = np.asarray(rdunet_apply_fused(variables, x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rdunet_xla_engine_matches_flax():
    """The optimized-XLA engine (VALID-s2 downs, split-concat ups) — the default
    throughput path on hardware — must match the flax forward exactly."""
    model = RDUNet(channels=3, base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    want = np.asarray(model.apply(variables, x))
    got = np.asarray(rdunet_apply_fused(variables, x, engine="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rdunet_t_fused_matches_flax():
    model = RDUNetT(base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    t = jnp.array([0.25, 0.75])
    variables = model.init(jax.random.PRNGKey(1), x, t)
    want = np.asarray(model.apply(variables, x, t))
    got = np.asarray(rdunet_t_apply_fused(variables, x, t, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # the optimized-XLA engine (DiffusionTrainer engine='xla') matches too,
    # including with remat
    got_xla = np.asarray(rdunet_t_apply_fused(variables, x, t, engine="xla"))
    np.testing.assert_allclose(got_xla, want, rtol=1e-4, atol=1e-5)
    grad_remat = jax.grad(
        lambda v: jnp.sum(rdunet_t_apply_fused(v, x, t, engine="xla", remat=True) ** 2)
    )(variables)
    grad_plain = jax.grad(
        lambda v: jnp.sum(model.apply(v, x, t) ** 2)
    )(variables)
    for a, b in zip(jax.tree_util.tree_leaves(grad_remat),
                    jax.tree_util.tree_leaves(grad_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_channel_padded_block_matches_unpadded():
    """pad_block_params + zero-padded input lanes == the exact block on real lanes."""
    cin, inner, cpad = 8, 4, 16
    block = DenoisingBlock(cin, inner, cin)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, cin))
    variables = block.init(jax.random.PRNGKey(1), x)
    want = np.asarray(block.apply(variables, x))

    padded_params = pad_block_params(variables["params"], cpad)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad - cin)))
    got = np.asarray(
        fused_denoising_block(xp, padded_params, tile_rows=8, interpret=True)
    )
    np.testing.assert_allclose(got[..., :cin], want, rtol=2e-5, atol=2e-5)
    # padded lanes stay exactly zero (residual carries the zero pad through)
    np.testing.assert_array_equal(got[..., cin:], 0.0)


@pytest.mark.parametrize("packed", [False, True])
def test_fused_block_trainable_grads_match_xla(packed):
    """custom-VJP fused block: forward == Pallas (interpret), grads == XLA path."""
    from vub_image_denoising_tpu.models.fused_apply import (
        _dense_block_xla,
        fused_block_trainable,
    )

    block = DenoisingBlock(8, 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8))
    params = block.init(jax.random.PRNGKey(2), x)["params"]

    def loss_fused(p, xx):
        out = fused_block_trainable(xx, p, None, True, packed)
        return jnp.mean(jnp.abs(out - y))

    def loss_xla(p, xx):
        return jnp.mean(jnp.abs(_dense_block_xla(p, xx) - y))

    lf, (gp_f, gx_f) = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, x)
    lx, (gp_x, gx_x) = jax.value_and_grad(loss_xla, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves((gp_f, gx_f)),
                    jax.tree_util.tree_leaves((gp_x, gx_x))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_supervised_step_with_fused_forward():
    """make_supervised_train_step over the fused-trainable forward runs and matches
    the XLA-path step to tolerance (VERDICT r1 #4)."""
    import optax

    from vub_image_denoising_tpu.models.fused_apply import fused_block_trainable
    from vub_image_denoising_tpu.train import TrainState, make_supervised_train_step

    block = DenoisingBlock(8, 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 8))
    params = block.init(jax.random.PRNGKey(2), x)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-2))

    def apply_fused(p, xx):
        return fused_block_trainable(xx, p["params"], None, True, False)

    def apply_xla(p, xx):
        return block.apply(p, xx)

    step_f = make_supervised_train_step(apply_fused, tx, accumulation_steps=2)
    step_x = make_supervised_train_step(apply_xla, tx, accumulation_steps=2)
    sf, lf = step_f(TrainState.create(params, tx), x, y)
    sx, lx = step_x(TrainState.create(params, tx), x, y)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(sf.params),
                    jax.tree_util.tree_leaves(sx.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_prepare_fused_params_identity():
    model = RDUNet(channels=3, base_filters=8)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = prepare_fused_params(variables)
    assert out["params"]["core"]["block_0_0"]["conv_0"]["kernel"].shape == \
        variables["params"]["core"]["block_0_0"]["conv_0"]["kernel"].shape


def test_precombined_block_matches_reference_block():
    """Lane-packed decomposition == the reference dense block (same linear map,
    different summation order) — forward AND gradients."""
    from vub_image_denoising_tpu.models.fused_apply import (
        _dense_block_xla,
        _dense_block_xla_precombined,
    )

    for c in (8, 16):
        block = DenoisingBlock(c, c // 2, c)
        x = jax.random.normal(jax.random.PRNGKey(c), (2, 16, 16, c))
        variables = block.init(jax.random.PRNGKey(1), x)
        p = variables["params"]
        want = np.asarray(_dense_block_xla(p, x))
        # sanity: the extracted-param reference path equals the flax block itself
        np.testing.assert_allclose(
            want, np.asarray(block.apply(variables, x)), rtol=1e-5, atol=1e-6
        )
        got = np.asarray(_dense_block_xla_precombined(p, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        g_ref = jax.grad(lambda pp: jnp.sum(_dense_block_xla(pp, x) ** 2))(p)
        g_new = jax.grad(lambda pp: jnp.sum(_dense_block_xla_precombined(pp, x) ** 2))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_new)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)


def test_custom_bwd_paths_match_reference_grads():
    """The backward-experiment wrappers (standard forward + restructured
    backward graph) must produce the same outputs AND gradients as the plain
    formulations: _dense_block_precombined_bwd vs _dense_block_xla, and
    _down_fast_bwd (matmul VJP) vs _down (conv VJP)."""
    from vub_image_denoising_tpu.models.fused_apply import (
        _dense_block_precombined_bwd,
        _dense_block_xla,
        _down,
        _down_fast_bwd,
        _down_s2d,
    )

    c = 8
    block = DenoisingBlock(c, c // 2, c)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, c))
    p = block.init(jax.random.PRNGKey(1), x)["params"]
    np.testing.assert_allclose(
        np.asarray(_dense_block_precombined_bwd(p, x)),
        np.asarray(_dense_block_xla(p, x)), rtol=1e-5, atol=1e-6,
    )
    g_ref = jax.grad(lambda pp, v: jnp.sum(_dense_block_xla(pp, v) ** 2),
                     argnums=(0, 1))(p, x)
    g_new = jax.grad(lambda pp, v: jnp.sum(_dense_block_precombined_bwd(pp, v) ** 2),
                     argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)

    # downsample: s2d formulation itself, then the custom-VJP wrapper
    from vub_image_denoising_tpu.nn.blocks import DownsampleBlock

    down = DownsampleBlock(2 * c)
    dx = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, c))
    dp = down.init(jax.random.PRNGKey(2), dx)["params"]
    np.testing.assert_allclose(
        np.asarray(_down_s2d(dp, dx)), np.asarray(_down(dp, dx)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(_down_fast_bwd(dp, dx)), np.asarray(_down(dp, dx)),
        rtol=1e-6, atol=1e-7,
    )
    g_ref = jax.grad(lambda pp, v: jnp.sum(_down(pp, v) ** 2), argnums=(0, 1))(dp, dx)
    g_new = jax.grad(lambda pp, v: jnp.sum(_down_fast_bwd(pp, v) ** 2),
                     argnums=(0, 1))(dp, dx)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_bwd_knobs_wire_into_core(monkeypatch):
    """VUB_BWD_PRECOMBINE / VUB_DOWN_MATMUL_BWD route _core through the wrappers
    with unchanged outputs and grads (knobs are read at import; patch the module
    globals the way the env would set them)."""
    from vub_image_denoising_tpu.models import fused_apply as fa
    from vub_image_denoising_tpu.models import RDUNet

    model = RDUNet(channels=3, base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x)

    def run():
        def loss(v):
            return jnp.sum(fa.rdunet_apply_fused(v, x, engine="xla") ** 2)
        return loss(variables), jax.grad(loss)(variables)

    y_ref, g_ref = run()
    monkeypatch.setattr(fa, "_BWD_PRECOMBINE_MIN_C", 0)
    monkeypatch.setattr(fa, "_DOWN_MATMUL_BWD", True)
    y_new, g_new = run()
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)
