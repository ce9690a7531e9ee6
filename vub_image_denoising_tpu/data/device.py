"""On-device (jittable) data transforms: noise injection, augmentation, normalization.

TPU-first replacement for the reference's host-side per-sample PIL/numpy work:
- Gaussian noise is added in [0,255] space, clipped, and cast through uint8 to replicate
  the reference's quantization exactly (custom_dataset.py:83-87 — noise is added to the
  float image then ``np.clip(...,0,255).astype(np.uint8)``, which truncates; this subtly
  changes the noise distribution vs naive float noise and matters for PSNR parity).
- Augmentation (random horizontal flip + rotation within ±10°, torchvision defaults:
  nearest resampling, zero fill) is applied identically to both images of a pair under
  one PRNG key — replacing the reference's seed-twice trick (custom_dataset.py:89-95).
- Normalization maps uint8 -> [0,1] -> [-1,1] (ToTensor + Normalize(0.5, 0.5),
  data_loader.py:35-38).

Everything here is pure and shape-static, so the whole degrade+normalize pipeline fuses
into the training step under jit — noise injection costs no extra HBM round-trips.
"""

from functools import partial

import jax
import jax.numpy as jnp


def add_gaussian_noise_u8(key, clean_u8, sigma):
    """Reference noise model: clip(clean + N(0, sigma^2), 0, 255) cast to uint8.

    ``clean_u8``: (N,H,W,C) uint8.  ``sigma``: scalar or (N,) per-sample levels in
    [0,255] units.  Returns uint8.
    """
    sigma = jnp.asarray(sigma, jnp.float32)
    if sigma.ndim == 1:
        sigma = sigma.reshape(-1, 1, 1, 1)
    noise = jax.random.normal(key, clean_u8.shape, jnp.float32) * sigma
    noisy = jnp.clip(clean_u8.astype(jnp.float32) + noise, 0.0, 255.0)
    return noisy.astype(jnp.uint8)


def normalize_u8(x_u8, dtype=jnp.float32):
    """uint8 -> [-1, 1]: ToTensor (x/255) then Normalize(mean .5, std .5)."""
    return (x_u8.astype(dtype) / 255.0 - 0.5) / 0.5


def denormalize(x):
    """[-1,1] -> [0,1] (reference ``denormalize``, diffusion_RDUnet.py:67-68)."""
    return x * 0.5 + 0.5


def _rotate_nearest(img, angle_deg):
    """Rotate one (H,W,C) image by angle (degrees, CCW like PIL) about the center,
    nearest-neighbor resampling, zero fill — torchvision RandomRotation defaults."""
    h, w = img.shape[0], img.shape[1]
    theta = -angle_deg * jnp.pi / 180.0  # inverse map for output->input sampling
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    out = img[iy, ix]
    return jnp.where(valid[..., None], out, jnp.zeros_like(out))


def augment_pair(key, a, b, max_rotation_deg=10.0):
    """Random horizontal flip (p=0.5) + uniform rotation in ±max_rotation_deg,
    applied identically to both images of each (N,H,W,C) pair."""
    n = a.shape[0]
    k_flip, k_rot = jax.random.split(key)
    flip = jax.random.bernoulli(k_flip, 0.5, (n,))
    angles = jax.random.uniform(
        k_rot, (n,), jnp.float32, -max_rotation_deg, max_rotation_deg
    )

    def one(img, do_flip, angle):
        img = jnp.where(do_flip, img[:, ::-1, :], img)
        return _rotate_nearest(img, angle)

    a = jax.vmap(one)(a, flip, angles)
    b = jax.vmap(one)(b, flip, angles)
    return a, b


@partial(jax.jit, static_argnames=("augment",))
def degrade_and_normalize(key, clean_u8, sigma, augment=False):
    """Full synthetic-noise pipeline: noise -> (augment) -> normalize to [-1,1].

    Returns (noisy, clean) float32 in [-1,1], matching the reference sample order
    (custom_dataset.py:97-100 returns (noisy, gt)).
    """
    k_noise, k_aug = jax.random.split(key)
    noisy_u8 = add_gaussian_noise_u8(k_noise, clean_u8, sigma)
    if augment:
        noisy_u8, clean_u8 = augment_pair(k_aug, noisy_u8, clean_u8)
    return normalize_u8(noisy_u8), normalize_u8(clean_u8)


@partial(jax.jit, static_argnames=("augment",))
def normalize_pair(key, noisy_u8, clean_u8, augment=False):
    """Real-noise pipeline (SIDD pairs): (augment) -> normalize to [-1,1]."""
    if augment:
        noisy_u8, clean_u8 = augment_pair(key, noisy_u8, clean_u8)
    return normalize_u8(noisy_u8), normalize_u8(clean_u8)
