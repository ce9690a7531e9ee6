"""Loss golden-value tests (reference: diffusion_RDUnet.py:57-65).

SSIM is checked against an independent scipy implementation of the pytorch_msssim
algorithm (11x11 gaussian, sigma 1.5, VALID padding, K=(0.01,0.03)).
"""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import convolve1d

from vub_image_denoising_tpu.diffusion.losses import (
    charbonnier_loss,
    combined_loss,
    ssim,
)


def test_charbonnier_golden():
    pred = jnp.array([[0.0, 1.0]])
    target = jnp.array([[0.0, 0.0]])
    # mean(sqrt(d^2 + 1e-6)) = (1e-3 + sqrt(1+1e-6)) / 2
    expected = (1e-3 + np.sqrt(1 + 1e-6)) / 2
    np.testing.assert_allclose(float(charbonnier_loss(pred, target)), expected, rtol=1e-6)


def test_charbonnier_at_zero_is_epsilon():
    x = jnp.ones((2, 3, 3, 1))
    np.testing.assert_allclose(float(charbonnier_loss(x, x)), 1e-3, rtol=1e-6)


def _ssim_numpy(a, b, data_range=1.0, win=11, sigma=1.5, k1=0.01, k2=0.03):
    coords = np.arange(win) - (win - 1) / 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()

    def blur(x):  # NHWC, valid padding, separable
        y = convolve1d(x, g, axis=1, mode="constant")
        y = convolve1d(y, g, axis=2, mode="constant")
        m = win // 2
        return y[:, m:-m, m:-m, :]

    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    mu_a, mu_b = blur(a), blur(b)
    saa = blur(a * a) - mu_a**2
    sbb = blur(b * b) - mu_b**2
    sab = blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)
    )
    return s.mean()


def test_ssim_identity_is_one():
    x = jnp.array(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-6)


def test_ssim_matches_scipy_reference():
    rng = np.random.RandomState(1)
    a = rng.rand(2, 40, 40, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(*a.shape).astype(np.float32), 0, 1)
    got = float(ssim(jnp.array(a), jnp.array(b)))
    want = _ssim_numpy(a.astype(np.float64), b.astype(np.float64))
    # fp32 variance terms (blur(a^2) - mu^2) cancel catastrophically against
    # c2=9e-4, bounding agreement with the f64 reference at ~1e-3 relative.
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_combined_loss_default_is_charbonnier():
    rng = np.random.RandomState(2)
    a = jnp.array(rng.rand(1, 16, 16, 3).astype(np.float32))
    b = jnp.array(rng.rand(1, 16, 16, 3).astype(np.float32))
    np.testing.assert_allclose(
        float(combined_loss(a, b)), float(charbonnier_loss(a, b)), rtol=1e-6
    )


def test_combined_loss_all_terms():
    rng = np.random.RandomState(3)
    a = jnp.array(rng.rand(1, 32, 32, 3).astype(np.float32))
    b = jnp.array(rng.rand(1, 32, 32, 3).astype(np.float32))
    got = float(combined_loss(a, b, mse_weight=1.0, charbonnier_weight=1.0, ssim_weight=1.0))
    want = (
        float(jnp.mean((a - b) ** 2))
        + float(charbonnier_loss(a, b))
        + (1.0 - float(ssim(a, b)))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)
