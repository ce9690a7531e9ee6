"""Numerical parity of our layer primitives against torch (CPU).

The reference is pure PyTorch; the 0.05 dB PSNR parity budget (BASELINE.md) requires our
conv / transpose-conv / PReLU semantics to match torch's exactly.  We verify each
primitive against torch.nn.functional with shared random weights rather than porting the
torch model (reference semantics: UNet/RDUNet_model.py:49-115).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.nn.layers import (
    Conv3x3,
    Downsample2x2,
    PReLU,
    Upsample2x2,
)

RTOL, ATOL = 1e-5, 1e-5


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


def test_conv3x3_matches_torch():
    x = _rand(2, 16, 16, 5)  # NHWC
    w = _rand(3, 3, 5, 7)  # HWIO
    b = _rand(7)

    mod = Conv3x3(features=7, precision=jax.lax.Precision.HIGHEST)
    params = {"params": {"kernel": jnp.array(w), "bias": jnp.array(b)}}
    y = np.asarray(mod.apply(params, jnp.array(x)))

    xt = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
    wt = torch.tensor(w).permute(3, 2, 0, 1)  # OIHW
    yt = F.conv2d(xt, wt, torch.tensor(b), padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(y, yt, rtol=RTOL, atol=ATOL)


def test_downsample2x2_matches_torch_strided_conv():
    x = _rand(2, 16, 16, 6)
    w = _rand(2, 2, 6, 12)
    b = _rand(12)

    mod = Downsample2x2(features=12, precision=jax.lax.Precision.HIGHEST)
    params = {"params": {"kernel": jnp.array(w), "bias": jnp.array(b)}}
    y = np.asarray(mod.apply(params, jnp.array(x)))
    assert y.shape == (2, 8, 8, 12)

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    wt = torch.tensor(w).permute(3, 2, 0, 1)
    yt = F.conv2d(xt, wt, torch.tensor(b), stride=2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(y, yt, rtol=RTOL, atol=ATOL)


def test_upsample2x2_matches_torch_conv_transpose():
    x = _rand(2, 8, 8, 12)
    # torch ConvTranspose2d weight layout: (Cin, Cout, kh, kw)
    w_torch = _rand(12, 6, 2, 2)
    b = _rand(6)
    # our layout: (kh, kw, cin, cout)
    w_ours = np.transpose(w_torch, (2, 3, 0, 1))

    mod = Upsample2x2(features=6, precision=jax.lax.Precision.HIGHEST)
    params = {"params": {"kernel": jnp.array(w_ours), "bias": jnp.array(b)}}
    y = np.asarray(mod.apply(params, jnp.array(x)))
    assert y.shape == (2, 16, 16, 6)

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    yt = (
        F.conv_transpose2d(xt, torch.tensor(w_torch), torch.tensor(b), stride=2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(y, yt, rtol=RTOL, atol=ATOL)


def test_prelu_matches_torch():
    x = _rand(2, 4, 4, 3)
    alpha = np.array([0.1, 0.25, 0.9], np.float32)

    mod = PReLU(channels=3)
    y = np.asarray(mod.apply({"params": {"alpha": jnp.array(alpha)}}, jnp.array(x)))

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    yt = F.prelu(xt, torch.tensor(alpha)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(y, yt, rtol=RTOL, atol=ATOL)


def test_prelu_default_alpha_is_quarter():
    mod = PReLU(channels=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.ones((1, 2, 2, 4)))
    np.testing.assert_allclose(np.asarray(params["params"]["alpha"]), 0.25)
