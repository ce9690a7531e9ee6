"""Metric parity tests vs independent scipy implementations of skimage's algorithms."""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import uniform_filter

from vub_image_denoising_tpu.eval.metrics import psnr, ssim_ref


def test_psnr_golden():
    a = np.zeros((1, 8, 8, 3), np.float32)
    b = np.full((1, 8, 8, 3), 0.1, np.float32)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
    np.testing.assert_allclose(float(psnr(jnp.array(a), jnp.array(b), 1.0)), 20.0, rtol=1e-5)
    # data_range=2 convention (evaluate_SIDD.py:63): 10*log10(4/0.01)
    np.testing.assert_allclose(
        float(psnr(jnp.array(a), jnp.array(b), 2.0)), 10 * np.log10(400), rtol=1e-5
    )


def _ssim_skimage_numpy(x, y, data_range, win=7, k1=0.01, k2=0.03):
    """Replication of skimage.metrics.structural_similarity defaults (per channel)."""
    pad = (win - 1) // 2
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    vals = []
    for c in range(x.shape[-1]):
        xc, yc = x[..., c], y[..., c]
        f = lambda im: uniform_filter(im, size=win)
        ux, uy = f(xc), f(yc)
        vx = cov_norm * (f(xc * xc) - ux * ux)
        vy = cov_norm * (f(yc * yc) - uy * uy)
        vxy = cov_norm * (f(xc * yc) - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
        vals.append(s[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def test_ssim_ref_identity():
    x = jnp.array(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    np.testing.assert_allclose(float(ssim_ref(x, x, 1.0)), 1.0, atol=1e-6)


def test_ssim_ref_matches_skimage_algorithm():
    rng = np.random.RandomState(1)
    x = (rng.rand(40, 40, 3) * 2 - 1).astype(np.float64)
    y = np.clip(x + 0.2 * rng.randn(40, 40, 3), -1, 1)
    got = float(ssim_ref(jnp.array(x, jnp.float32), jnp.array(y, jnp.float32), 2.0))
    want = _ssim_skimage_numpy(x, y, data_range=2.0)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_psnr_batch_is_mean_of_per_image():
    rng = np.random.RandomState(2)
    a = rng.rand(4, 16, 16, 3).astype(np.float32)
    b = rng.rand(4, 16, 16, 3).astype(np.float32)
    batch = float(psnr(jnp.array(a), jnp.array(b), 1.0))
    singles = np.mean([float(psnr(jnp.array(a[i]), jnp.array(b[i]), 1.0)) for i in range(4)])
    np.testing.assert_allclose(batch, singles, rtol=1e-5)
