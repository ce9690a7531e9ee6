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


def test_rdunet_t_fused_matches_flax():
    model = RDUNetT(base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    t = jnp.array([0.25, 0.75])
    variables = model.init(jax.random.PRNGKey(1), x, t)
    want = np.asarray(model.apply(variables, x, t))
    got = np.asarray(rdunet_t_apply_fused(variables, x, t, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


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


def test_prepare_fused_params_identity():
    model = RDUNet(channels=3, base_filters=8)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = prepare_fused_params(variables)
    assert out["params"]["core"]["block_0_0"]["conv_0"]["kernel"].shape == \
        variables["params"]["core"]["block_0_0"]["conv_0"]["kernel"].shape
