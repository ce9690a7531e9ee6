"""Training losses for the diffusion denoiser.

Reference: diffusion_denoising/diffusion_RDUnet.py:57-65.
``combined_loss = mse_w*MSE + charb_w*Charbonnier + ssim_w*(1 - SSIM)`` with default
weights (0, 1, 0); the SSIM term matches ``pytorch_msssim.ssim`` defaults
(11x11 gaussian window, sigma=1.5, K=(0.01, 0.03), per-channel mean).
"""

import jax
import jax.numpy as jnp


def charbonnier_loss(pred, target, epsilon=1e-3):
    """mean(sqrt((pred-target)^2 + eps^2)) — diffusion_RDUnet.py:57-58."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + epsilon**2))


def _gaussian_window(size=11, sigma=1.5, dtype=jnp.float32):
    coords = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def ssim(pred, target, data_range=1.0, win_size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Single-scale SSIM over NHWC batches, matching pytorch_msssim.ssim defaults.

    pytorch_msssim blurs with a separable 11x11 gaussian (sigma 1.5), VALID padding,
    uses K=(0.01, 0.03) and averages over all pixels/channels/batch
    (size_average=True).  Returns a scalar.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    win = _gaussian_window(win_size, sigma)

    def blur(x):
        # separable gaussian, VALID padding, per-channel (NHWC)
        c = x.shape[-1]
        kh = jnp.tile(win.reshape(win_size, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(win.reshape(1, win_size, 1, 1), (1, 1, 1, c))
        dn = ("NHWC", "HWIO", "NHWC")
        # this JAX build lowers default-precision f32 convs to ~bf16 accuracy;
        # metric convs must be exact
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )
        x = jax.lax.conv_general_dilated(
            x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )
        return x

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = blur(pred)
    mu_y = blur(target)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = blur(pred * pred) - mu_xx
    sigma_yy = blur(target * target) - mu_yy
    sigma_xy = blur(pred * target) - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return jnp.mean(ssim_map)


def combined_loss(
    pred,
    target,
    mse_weight=0.0,
    charbonnier_weight=1.0,
    ssim_weight=0.0,
    epsilon=1e-3,
):
    """Weighted MSE + Charbonnier + (1-SSIM) — diffusion_RDUnet.py:60-65."""
    loss = charbonnier_weight * charbonnier_loss(pred, target, epsilon)
    if mse_weight:
        loss = loss + mse_weight * jnp.mean((pred - target) ** 2)
    if ssim_weight:
        loss = loss + ssim_weight * (1.0 - ssim(pred, target, data_range=1.0))
    return loss
