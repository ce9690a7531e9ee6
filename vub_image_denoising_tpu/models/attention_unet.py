"""Attention U-Net generator + spectral-norm PatchGAN discriminator.

Recovered from bytecode ``/root/reference/__pycache__/train_denoising_gan.cpython-312.pyc``
(original train_denoising_gan.py, 294 lines); citations give original line numbers.

AttentionUNet (train_denoising_gan.py:37-89), grayscale 1->1:
  encoders conv_block(1->64, 64->128, 128->256, 256->512) with MaxPool2d(2) between;
  conv_block = Conv3x3+ReLU+Conv3x3+ReLU (:56-69), final variant = Conv3x3+Tanh;
  upconvs ConvTranspose2d(k2, s2) (:70-72); decoder at each scale gates the skip with
  AttentionBlock(in, gating, inter) = (256,256,128), (128,128,64), (64,64,32) and
  concatenates cat([upconv, att], 1) (:73-89); dec1 = conv_block(64->1, final).

AttentionBlock (:11-35): g1 = BN(1x1(g)); x1 = BN(1x1(x)); psi = sigmoid(BN(1x1(
relu(g1+x1)))); return x * psi.

PatchGAN (:91-112), in_channels=2 (cat(noisy, image)):
  SN-Conv(2->64, k4 s2 p1)+LReLU0.2, SN-Conv(64->128, k4 s2 p1)+BN+LReLU,
  SN-Conv(128->256, k4 s2 p1)+BN+LReLU, SN-Conv(256->512, k4 s1 p1)+BN+LReLU,
  Conv(512->1, k4 s1 p1)+Sigmoid.  Spectral norm = torch's power-iteration (flax
  nn.SpectralNorm, u stored in batch_stats).

Init: weights_init_normal (:146-153) — Conv weights N(0, 0.02); BN weight N(1, 0.02),
bias 0.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.torch_layers import TorchBatchNorm, TorchConv, leaky_relu, max_pool_2x2
from ..nn.layers import Upsample2x2
from ..nn.init import torch_conv_bias


def normal_002_conv(key, shape, dtype=jnp.float32):
    """weights_init_normal: N(0, 0.02) on conv weights (train_denoising_gan.py:146-149)."""
    return 0.02 * jax.random.normal(key, shape, dtype)


class _ConvN002(TorchConv):
    """TorchConv with N(0,0.02) weight init."""

    @nn.compact
    def __call__(self, x):
        kh = kw = self.kernel_size if isinstance(self.kernel_size, int) else self.kernel_size[0]
        cin = x.shape[-1]
        kernel = self.param("kernel", normal_002_conv, (kh, kw, cin, self.features), jnp.float32)
        ph = self.padding if isinstance(self.padding, int) else self.padding[0]
        s = self.stride if isinstance(self.stride, int) else self.stride[0]
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (s, s), [(ph, ph), (ph, ph)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=self.precision,
        )
        bias = self.param("bias", torch_conv_bias(cin * kh * kw), (self.features,), jnp.float32)
        return y + bias.astype(x.dtype)


class ConvPair(nn.Module):
    """conv_block: Conv3x3+ReLU, Conv3x3+ReLU (train_denoising_gan.py:62-69).

    Torch Sequential indices are 0,2 for the convs -> names '0' and '2'.
    """

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_ConvN002(self.out_channels, 3, 1, 1, name="0")(x))
        return nn.relu(_ConvN002(self.out_channels, 3, 1, 1, name="2")(x))


class FinalConv(nn.Module):
    """final conv_block: Conv3x3 + Tanh (train_denoising_gan.py:57-61)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        return jnp.tanh(_ConvN002(self.out_channels, 3, 1, 1, name="0")(x))


class AttentionBlock(nn.Module):
    """Additive attention gate (train_denoising_gan.py:11-35)."""

    in_channels: int
    gating_channels: int
    inter_channels: int

    def setup(self):
        self.w_g_conv = _ConvN002(self.inter_channels, 1, 1, 0, name="W_g.0")
        self.w_g_bn = TorchBatchNorm(self.inter_channels, name="W_g.1")
        self.w_x_conv = _ConvN002(self.inter_channels, 1, 1, 0, name="W_x.0")
        self.w_x_bn = TorchBatchNorm(self.inter_channels, name="W_x.1")
        self.psi_conv = _ConvN002(1, 1, 1, 0, name="psi.0")
        self.psi_bn = TorchBatchNorm(1, name="psi.1")

    def __call__(self, x, g, train: bool = True):
        g1 = self.w_g_bn(self.w_g_conv(g), train=train)
        x1 = self.w_x_bn(self.w_x_conv(x), train=train)
        psi = nn.relu(g1 + x1)
        psi = nn.sigmoid(self.psi_bn(self.psi_conv(psi), train=train))
        return x * psi


class _UpconvN002(Upsample2x2):
    """ConvTranspose2d(k2,s2) with N(0,0.02) init (train_denoising_gan.py:70-72,146)."""

    @nn.compact
    def __call__(self, x):
        n, h, w, cin = x.shape
        kernel = self.param("kernel", normal_002_conv, (2, 2, cin, self.features), jnp.float32)
        bias = self.param("bias", torch_conv_bias(self.features * 4), (self.features,), jnp.float32)
        wk = kernel.transpose(2, 0, 1, 3).reshape(cin, 4 * self.features).astype(x.dtype)
        y = jax.lax.dot_general(x, wk, (((3,), (0,)), ((), ())), precision=self.precision)
        y = y.reshape(n, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, self.features)
        return y + bias.astype(x.dtype)


class AttentionUNet(nn.Module):
    """Generator (train_denoising_gan.py:37-89)."""

    in_channels: int = 1
    out_channels: int = 1

    def setup(self):
        self.enc1 = ConvPair(64)
        self.enc2 = ConvPair(128)
        self.enc3 = ConvPair(256)
        self.enc4 = ConvPair(512)
        self.upconv4 = _UpconvN002(256, name="upconv4")
        self.upconv3 = _UpconvN002(128, name="upconv3")
        self.upconv2 = _UpconvN002(64, name="upconv2")
        self.dec4 = ConvPair(256)
        self.dec3 = ConvPair(128)
        self.dec2 = ConvPair(64)
        self.dec1 = FinalConv(self.out_channels)
        self.att4 = AttentionBlock(256, 256, 128)
        self.att3 = AttentionBlock(128, 128, 64)
        self.att2 = AttentionBlock(64, 64, 32)

    def __call__(self, x, train: bool = True):
        enc1 = self.enc1(x)
        enc2 = self.enc2(max_pool_2x2(enc1))
        enc3 = self.enc3(max_pool_2x2(enc2))
        enc4 = self.enc4(max_pool_2x2(enc3))

        up4 = self.upconv4(enc4)
        att4 = self.att4(enc3, up4, train=train)
        dec4 = self.dec4(jnp.concatenate([up4, att4], axis=-1))

        up3 = self.upconv3(dec4)
        att3 = self.att3(enc2, up3, train=train)
        dec3 = self.dec3(jnp.concatenate([up3, att3], axis=-1))

        up2 = self.upconv2(dec3)
        att2 = self.att2(enc1, up2, train=train)
        dec2 = self.dec2(jnp.concatenate([up2, att2], axis=-1))

        return self.dec1(dec2)


class PatchGAN(nn.Module):
    """Spectral-norm PatchGAN (train_denoising_gan.py:91-112)."""

    in_channels: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        def sn(layer):
            return nn.SpectralNorm(layer, collection_name="batch_stats")

        x = sn(_ConvN002(64, 4, 2, 1, name="model.0"))(x, update_stats=train)
        x = leaky_relu(x, 0.2)
        x = sn(_ConvN002(128, 4, 2, 1, name="model.2"))(x, update_stats=train)
        x = TorchBatchNorm(128, name="model.3")(x, train=train)
        x = leaky_relu(x, 0.2)
        x = sn(_ConvN002(256, 4, 2, 1, name="model.5"))(x, update_stats=train)
        x = TorchBatchNorm(256, name="model.6")(x, train=train)
        x = leaky_relu(x, 0.2)
        x = sn(_ConvN002(512, 4, 1, 1, name="model.8"))(x, update_stats=train)
        x = TorchBatchNorm(512, name="model.9")(x, train=train)
        x = leaky_relu(x, 0.2)
        x = _ConvN002(1, 4, 1, 1, name="model.11")(x)
        return nn.sigmoid(x)
