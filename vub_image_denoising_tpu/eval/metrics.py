"""On-device image-quality metrics matching the reference's conventions exactly.

Two PSNR/SSIM conventions coexist in the reference and both are reproduced
(BASELINE.md "conventions to match"):
- SIDD eval (evaluate_SIDD/evaluate_SIDD.py:63-64): skimage metrics on [-1,1] arrays
  with ``data_range=2``; SSIM is skimage ``structural_similarity`` defaults — uniform
  7x7 window (NOT gaussian), unbiased covariance (N/(N-1)), border crop, per-channel
  mean via ``channel_axis=-1``.
- comparative suite (evaluate_Unet_diffusion/evaluate_model.py:36-51): metrics on
  denormalized [0,1] arrays with ``data_range=1``; PSNR via 10*log10(range^2/mse)
  (:36-41), equivalent to hyperparams_search.py:11-16's 20*log10(1/sqrt(mse)).

``ssim_ref`` here is the skimage-compatible SSIM; the gaussian pytorch_msssim-compatible
one used for the training loss lives in diffusion/losses.py.
"""

import jax
import jax.numpy as jnp


def mse(pred, target, axis=None):
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean((pred - target) ** 2, axis=axis)


def psnr_per_image(pred, target, data_range=1.0):
    """Per-image PSNR vector over an (N,H,W,C) batch: 10*log10(range^2 / mse)."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    m = mse(pred, target, axis=(1, 2, 3))
    return 10.0 * jnp.log10((data_range**2) / m)


def psnr(pred, target, data_range=1.0):
    """Per-image PSNR over (H,W,C), mean over the batch; 10*log10(range^2 / mse).

    Accepts (H,W,C) or (N,H,W,C).
    """
    return jnp.mean(psnr_per_image(pred, target, data_range))


def _uniform_valid_mean(x, win):
    """7x7 (win x win) mean filter with VALID padding over NHWC, per channel."""
    c = x.shape[-1]
    k = jnp.full((win, win, 1, c), 1.0 / (win * win), x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,  # metric convs must be exact f32
    )


def ssim_ref(pred, target, data_range=2.0, win_size=7, k1=0.01, k2=0.03):
    """skimage.structural_similarity-compatible SSIM (defaults, multichannel).

    Matches skimage's algorithm: uniform window, unbiased covariance with
    cov_norm = NP/(NP-1) (NP = win^2), border crop of win//2 (realized here by VALID
    filtering), SSIM map averaged over pixels and channels.  Accepts (H,W,C) or
    (N,H,W,C); returns the batch-mean scalar.
    """
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    ux = _uniform_valid_mean(x, win_size)
    uy = _uniform_valid_mean(y, win_size)
    uxx = _uniform_valid_mean(x * x, win_size)
    uyy = _uniform_valid_mean(y * y, win_size)
    uxy = _uniform_valid_mean(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


def ssim_ref_per_image(pred, target, data_range=2.0, win_size=7, k1=0.01, k2=0.03):
    """Per-image skimage-convention SSIM vector over an (N,H,W,C) batch."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    return jax.vmap(
        lambda a, b: ssim_ref(a[None], b[None], data_range, win_size, k1, k2)
    )(pred, target)
