"""RCA-GAN loss stack (recovered from paper_gan.pyc, original lines 202-287).

- PerceptualLoss (:203-216): MSE between VGG19 features[:8] of the two images
  (grayscale channel-repeated to 3).
- TextureLoss (:218-229): MSE between gram matrices computed directly on the images;
  gram flattens (N,C,H,W) -> (N*C, H*W), G = f f^T / (N*C*H*W).
- ContentLoss (:230-233): sqrt(L1(img1,img2)^2 + 1e-8).
- WGAN_GP_Loss (:234-267): adversarial value mean(D(fake)) - mean(D(real)) + GP, with
  gradient penalty lambda_gp * mean((||grad_xhat D(xhat)||_2 - 1)^2) at
  xhat = eps*real + (1-eps)*fake, eps ~ U(0,1) per sample (:240-260).  The nested
  gradient maps to jax.grad inside the loss (fully differentiable for the G step).
- MultimodalLoss (:268-287): lambda1*percep + lambda2*content + lambda3*texture
  + lambda4*adv; train_rca_gan uses (1, 0.01, 0.001, 1).
"""

from typing import Callable

import jax
import jax.numpy as jnp


def perceptual_loss(vgg_apply: Callable, vgg_params, real, generated):
    """MSE between VGG features; argument order matches the reference call
    perceptual_loss(real_images, generated_images) (paper_gan.py:281)."""
    f1 = vgg_apply(vgg_params, real)
    f2 = vgg_apply(vgg_params, generated)
    return jnp.mean((f1 - f2) ** 2)


def gram_matrix(x_nhwc):
    """Reference gram (paper_gan.py:219-224) on NCHW-flattened (N*C, H*W) features."""
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))  # to NCHW to match the reference flatten
    a, b, c, d = x.shape
    f = x.reshape(a * b, c * d)
    g = f @ f.T
    return g / (a * b * c * d)


def texture_loss(generated, real):
    return jnp.mean((gram_matrix(generated) - gram_matrix(real)) ** 2)


def content_loss(generated, real):
    l1 = jnp.mean(jnp.abs(generated - real))
    return jnp.sqrt(l1**2 + 1e-8)


def gradient_penalty(d_apply: Callable, d_params, key, real, fake, lambda_gp=10.0):
    """WGAN-GP (paper_gan.py:240-260)."""
    n = real.shape[0]
    eps = jax.random.uniform(key, (n, 1, 1, 1), real.dtype)
    interp = eps * real + (1 - eps) * fake

    def d_sum(x):
        return jnp.sum(d_apply(d_params, x))

    grads = jax.grad(d_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads.reshape(n, -1) ** 2, axis=1) + 1e-12)
    return lambda_gp * jnp.mean((norms - 1.0) ** 2)


def wgan_adversarial(d_apply: Callable, d_params, key, real, fake, lambda_gp=10.0):
    """mean(D(fake)) - mean(D(real)) + GP (paper_gan.py:262-267)."""
    d_real = jnp.mean(d_apply(d_params, real))
    d_fake = jnp.mean(d_apply(d_params, fake))
    gp = gradient_penalty(d_apply, d_params, key, real, fake, lambda_gp)
    return d_fake - d_real + gp


def multimodal_loss(
    vgg_apply, vgg_params, d_apply, d_params, key,
    generated, real,
    lambda1=1.0, lambda2=0.01, lambda3=0.001, lambda4=1.0, lambda_gp=10.0,
):
    """Generator objective (paper_gan.py:280-287).  The reference signature also takes
    noisy_images but never uses them."""
    l_percep = perceptual_loss(vgg_apply, vgg_params, real, generated)
    l_content = content_loss(generated, real)
    l_texture = texture_loss(generated, real)
    l_adv = wgan_adversarial(d_apply, d_params, key, real, generated, lambda_gp)
    total = lambda1 * l_percep + lambda2 * l_content + lambda3 * l_texture + lambda4 * l_adv
    return total, {
        "perceptual": l_percep, "content": l_content,
        "texture": l_texture, "adversarial": l_adv,
    }
