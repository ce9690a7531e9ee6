"""Experimental + legacy model families recovered from bytecode-only modules.

- ``GaussianDiffusion`` — true DDPM machinery from
  __pycache__/experimental_diffusion_gan.pyc (orig experimental_diffusion_gan.py:12-55):
  linear beta schedule (linspace), alpha cumprod (+prev, posterior variance),
  ``q_sample`` (sqrt(acp)*x0 + sqrt(1-acp)*noise), ``predict_start_from_noise``,
  ``p_losses`` (MSE between true and predicted noise), ``get_noised_tensor``
  (q_sample then model(x_noisy, t)).
- ``SmallUNet`` — the tiny conv stack embedded in the same module (:56-87): encoder
  Conv(in,64)+ReLU+Conv(64,128)+ReLU, middle Conv(128,128)+ReLU, decoder
  Conv(128,64)+ReLU+Conv(64,out); the reference's forward ignores its ``t`` argument.
- ``GeneratorWithDiffusion`` (:175-267) — RCA-GAN-style generator whose attention
  output is pushed through ``get_noised_tensor`` (random per-batch DDPM timestep) before
  the residual trunk; sequential multi-scale stem (1x1, 3x3, 5x5, 7x7 convs + ReLU).
- ``UNetS`` — legacy ``UNet_S_Checkpointed`` from
  diffusion_denoising/__pycache__/diffusion_model.pyc (orig diffusion_model.py:24-66):
  3-scale t-conditioned U-Net (channels 4->32->64->128), ConvT(k2,s2) upconvs, skip
  concats, final conv+Tanh to 3 channels; each block ran under
  torch.utils.checkpoint -> optional ``remat`` here (jax.checkpoint).
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Upsample2x2
from ..nn.torch_layers import TorchConv, max_pool_2x2
from .rca_gan import ConvBlock, CooperativeAttention, DeconvBlock, ResidualBlock


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """DDPM schedule + losses (experimental_diffusion_gan.py:12-55)."""

    beta_start: float = 1e-4
    beta_end: float = 0.02
    num_timesteps: int = 1000

    @property
    def betas(self):
        return jnp.linspace(self.beta_start, self.beta_end, self.num_timesteps)

    @property
    def alpha_cumprod(self):
        return jnp.cumprod(1.0 - self.betas, axis=0)

    @property
    def alpha_cumprod_prev(self):
        return jnp.concatenate([jnp.ones((1,)), self.alpha_cumprod[:-1]])

    @property
    def posterior_variance(self):
        acp = self.alpha_cumprod
        return self.betas * (1.0 - self.alpha_cumprod_prev) / (1.0 - acp)

    def q_sample(self, x_start, t, noise):
        """sqrt(acp_t)*x0 + sqrt(1-acp_t)*noise; t is a per-image int array."""
        acp = self.alpha_cumprod
        s1 = jnp.sqrt(acp)[t].reshape(-1, 1, 1, 1).astype(x_start.dtype)
        s2 = jnp.sqrt(1.0 - acp)[t].reshape(-1, 1, 1, 1).astype(x_start.dtype)
        return s1 * x_start + s2 * noise

    def predict_start_from_noise(self, x_t, t, noise):
        acp = self.alpha_cumprod
        s2 = jnp.sqrt(1.0 - acp)[t].reshape(-1, 1, 1, 1).astype(x_t.dtype)
        s1 = jnp.sqrt(acp)[t].reshape(-1, 1, 1, 1).astype(x_t.dtype)
        return (x_t - s2 * noise) / s1

    def p_losses(self, model_apply, x_start, t, noise):
        x_noisy = self.q_sample(x_start, t, noise)
        predicted = model_apply(x_noisy, t)
        return jnp.mean((noise - predicted) ** 2)

    def get_noised_tensor(self, model_apply, x_start, t, noise):
        x_noisy = self.q_sample(x_start, t, noise)
        return model_apply(x_noisy, t)


class SmallUNet(nn.Module):
    """experimental_diffusion_gan.py:56-87 (the t argument is unused, as in the
    reference)."""

    out_channels: int = 64

    @nn.compact
    def __call__(self, x, t=None):
        x = nn.relu(TorchConv(64, 3, 1, 1, name="encoder.0")(x))
        x = nn.relu(TorchConv(128, 3, 1, 1, name="encoder.2")(x))
        x = nn.relu(TorchConv(128, 3, 1, 1, name="middle.0")(x))
        x = nn.relu(TorchConv(64, 3, 1, 1, name="decoder.0")(x))
        return TorchConv(self.out_channels, 3, 1, 1, name="decoder.2")(x)


class GeneratorWithDiffusion(nn.Module):
    """experimental_diffusion_gan.py:175-267."""

    in_channels: int = 1
    out_channels: int = 1
    num_timesteps: int = 1000

    def setup(self):
        self.conv1 = TorchConv(64, 1, 1, 0, name="feature_extraction.0")
        self.conv3 = TorchConv(64, 3, 1, 1, name="feature_extraction.2")
        self.conv5 = TorchConv(64, 5, 1, 2, name="feature_extraction.4")
        self.conv7 = TorchConv(64, 7, 1, 3, name="feature_extraction.6")
        self.denoising_blocks = [ConvBlock(64, name=f"denoising_blocks.{i}") for i in range(8)]
        self.one_conv_block = ConvBlock(64)
        self.cooperative_attention = CooperativeAttention(64)
        self.diffusion_model = GaussianDiffusion(num_timesteps=self.num_timesteps)
        self.unet = SmallUNet(64)
        self.residual_blocks = [ResidualBlock(64, name=f"residual_blocks.{i}") for i in range(9)]
        deconvs = [DeconvBlock(64, 3, 1, 1, name=f"deconv_blocks.{i}") for i in range(4)]
        deconvs.append(DeconvBlock(self.out_channels, 1, 1, 0, name="deconv_blocks.4"))
        self.deconv_blocks = deconvs

    def __call__(self, x, key, train: bool = True):
        feat = nn.relu(self.conv1(x))
        feat = nn.relu(self.conv3(feat))
        feat = nn.relu(self.conv5(feat))
        feat = nn.relu(self.conv7(feat))
        d = feat
        for blk in self.denoising_blocks:
            d = blk(d, train=train)
        d = feat - d
        conv_out = self.one_conv_block(d, train=train)
        att = self.cooperative_attention(conv_out, train=train)
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (x.shape[0],), 0, self.num_timesteps)
        noise = jax.random.normal(k_noise, att.shape, att.dtype)
        diff_out = self.diffusion_model.get_noised_tensor(
            lambda xn, tt: self.unet(xn, tt), att, t, noise
        )
        r = diff_out
        for blk in self.residual_blocks:
            r = blk(r, train=train)
        out = r + conv_out
        for blk in self.deconv_blocks:
            out = blk(out, train=train)
        return jnp.tanh(out + x)


class _ConvPairS(nn.Module):
    """Legacy UNet_S conv_block: Conv3x3+ReLU x2 (diffusion_model.py:37-50)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(TorchConv(self.out_channels, 3, 1, 1, name="0")(x))
        return nn.relu(TorchConv(self.out_channels, 3, 1, 1, name="2")(x))


class _FinalConvS(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return jnp.tanh(TorchConv(self.out_channels, 3, 1, 1, name="0")(x))


class UNetS(nn.Module):
    """Legacy UNet_S_Checkpointed (diffusion_model.py:24-66): 3-scale t-conditioned
    U-Net with gradient checkpointing per block (remat)."""

    remat: bool = False

    def setup(self):
        conv_pair = nn.remat(_ConvPairS) if self.remat else _ConvPairS
        final = nn.remat(_FinalConvS) if self.remat else _FinalConvS
        self.enc1 = conv_pair(32)
        self.enc2 = conv_pair(64)
        self.enc3 = conv_pair(128)
        self.upconv3 = Upsample2x2(64, name="upconv3")
        self.upconv2 = Upsample2x2(32, name="upconv2")
        self.dec3 = conv_pair(64)
        self.dec2 = conv_pair(32)
        self.dec1 = final(3)

    def __call__(self, x, t):
        n, h, w, _ = x.shape
        t = jnp.asarray(t, x.dtype)
        t_plane = jnp.broadcast_to(t.reshape(-1, 1, 1, 1), (n, h, w, 1))
        x = jnp.concatenate([x, t_plane], axis=-1)
        enc1 = self.enc1(x)
        enc2 = self.enc2(max_pool_2x2(enc1))
        enc3 = self.enc3(max_pool_2x2(enc2))
        dec3 = self.dec3(jnp.concatenate([self.upconv3(enc3), enc2], axis=-1))
        dec2 = self.dec2(jnp.concatenate([self.upconv2(dec3), enc1], axis=-1))
        return self.dec1(dec2)
