"""RCA-GAN — the reference's "paper GAN" (residual cooperative-attention GAN).

Recovered from bytecode ``/root/reference/__pycache__/paper_gan.cpython-312.pyc``
(original paper_gan.py, 457 lines); citations give the original line numbers embedded in
the bytecode.

Generator (paper_gan.py:114-172), default grayscale 1->1:
  MultiScaleConv stem (parallel 1/3/5/7 convs each out/4 channels + BN, concat, 1x1
  fuse + BN; :91-112) -> 8x ConvBlock(64) whose output is SUBTRACTED from the stem
  output (noise estimation, :150-153) -> 1x ConvBlock -> CooperativeAttention
  (ChannelAttention then SpatialAttention; :39-48) -> 9x ResidualBlock(64) + skip from
  the pre-attention conv output (:157-159) -> 4x DeconvBlock(64,64,k3) + DeconvBlock(64,
  out,k1) -> + input -> Tanh (:160-172).

ChannelAttention (:9-25): BatchNorm statistics attention — with scalar learnable
gamma/beta (init 0): mc = sigmoid(gamma/sqrt(var+1e-5) * (bn_out-mu)/sqrt(var+1e-5)
+ beta), var/mu over (N,H,W) with torch's unbiased variance; returns mc * x.
SpatialAttention (:26-37): sigmoid(conv7x7(cat(mean_c, max_c))) * x.

Block quirks reproduced exactly:
- ConvBlock (:50-58): lrelu0.2(BN(conv(k,s,p)))
- ResidualBlock (:60-78): relu(conv2(bn2(relu(bn1(conv1(x))))) + x) — note bn2 is
  applied BEFORE conv2 (reference quirk).
- DeconvBlock (:80-88): lrelu0.2(BN(convT(k,s=1,p)))

Discriminator (:175-200): 6 ConvBlocks (in->64 s1, 64->64 s2, 64->128 s1, 128->128 s2,
128->256 s1, 256->256 s2) -> flatten -> Linear(262144,1024) -> ReLU -> Linear(1024,1)
(262144 = 32*32*256 for 256^2 inputs).

All modules take ``train: bool`` for BatchNorm mode; running stats live in the
``batch_stats`` collection.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..nn.torch_layers import (
    TorchBatchNorm,
    TorchConv,
    TorchConvTranspose,
    TorchLinear,
    leaky_relu,
)


class ChannelAttention(nn.Module):
    in_channels: int

    def setup(self):
        self.bn = TorchBatchNorm(self.in_channels)
        self.gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        self.beta = self.param("beta", nn.initializers.zeros, (1,), jnp.float32)

    def __call__(self, x, train: bool = True):
        bn_out = self.bn(x, train=train)
        # torch.mean/var over (0,2,3) keepdim -> per-channel over batch+space; torch.var
        # is unbiased (ddof=1)
        mu = jnp.mean(bn_out, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(bn_out, axis=(0, 1, 2), keepdims=True, ddof=1)
        weights = self.gamma.astype(x.dtype) / jnp.sqrt(var + 1e-5)
        normalized = (bn_out - mu) / jnp.sqrt(var + 1e-5)
        mc = nn.sigmoid(weights * normalized + self.beta.astype(x.dtype))
        return mc * x


class SpatialAttention(nn.Module):
    in_channels: int

    def setup(self):
        self.conv1 = TorchConv(1, kernel_size=7, stride=1, padding=3)

    def __call__(self, x):
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        combined = jnp.concatenate([avg_out, max_out], axis=-1)
        ms = nn.sigmoid(self.conv1(combined))
        return ms * x


class CooperativeAttention(nn.Module):
    in_channels: int

    def setup(self):
        self.channel_attention = ChannelAttention(self.in_channels)
        self.spatial_attention = SpatialAttention(self.in_channels)

    def __call__(self, x, train: bool = True):
        x = self.channel_attention(x, train=train)
        return self.spatial_attention(x)


class ConvBlock(nn.Module):
    """lrelu0.2(norm(conv(k,s,p))) (paper_gan.py:50-58).

    ``norm`` defaults to the reference's BatchNorm.  ``"none"`` and ``"layernorm"``
    exist for the WGAN-GP critic ablation (the WGAN-GP paper's own guidance is that
    per-sample penalties are incompatible with batch statistics; LayerNorm over the
    channel axis is the standard drop-in).  Param names are unchanged for norm="bn"
    so .pth checkpoint mapping is unaffected.
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    norm: str = "bn"

    def setup(self):
        self.conv = TorchConv(self.out_channels, self.kernel_size, self.stride, self.padding)
        if self.norm == "bn":
            self.bn = TorchBatchNorm(self.out_channels)
        elif self.norm == "layernorm":
            self.ln = nn.LayerNorm()
        elif self.norm != "none":
            raise ValueError(f"unknown norm {self.norm!r}")

    def __call__(self, x, train: bool = True):
        h = self.conv(x)
        if self.norm == "bn":
            h = self.bn(h, train=train)
        elif self.norm == "layernorm":
            h = self.ln(h)
        return leaky_relu(h, 0.2)


class ResidualBlock(nn.Module):
    in_channels: int

    def setup(self):
        self.conv1 = TorchConv(self.in_channels, 3, 1, 1)
        self.bn1 = TorchBatchNorm(self.in_channels)
        self.bn2 = TorchBatchNorm(self.in_channels)
        self.conv2 = TorchConv(self.in_channels, 3, 1, 1)

    def __call__(self, x, train: bool = True):
        out = self.conv1(x)
        out = self.bn1(out, train=train)
        out = nn.relu(out)
        out = self.bn2(out, train=train)  # reference quirk: bn2 before conv2
        out = self.conv2(out)
        out = out + x
        return nn.relu(out)


class DeconvBlock(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    def setup(self):
        assert self.stride == 1, "reference uses stride-1 deconvs only"
        self.conv_t = TorchConvTranspose(self.out_channels, self.kernel_size, self.padding)
        self.bn = TorchBatchNorm(self.out_channels)

    def __call__(self, x, train: bool = True):
        return leaky_relu(self.bn(self.conv_t(x), train=train), 0.2)


class MultiScaleConv(nn.Module):
    out_channels: int

    def setup(self):
        mid = self.out_channels // 4
        self.conv1x1 = TorchConv(mid, 1, 1, 0)
        self.conv3x3 = TorchConv(mid, 3, 1, 1)
        self.conv5x5 = TorchConv(mid, 5, 1, 2)
        self.conv7x7 = TorchConv(mid, 7, 1, 3)
        self.final_conv = TorchConv(self.out_channels, 1, 1, 0)
        self.bn1x1 = TorchBatchNorm(mid)
        self.bn3x3 = TorchBatchNorm(mid)
        self.bn5x5 = TorchBatchNorm(mid)
        self.bn7x7 = TorchBatchNorm(mid)
        self.bn_final = TorchBatchNorm(self.out_channels)

    def __call__(self, x, train: bool = True):
        o1 = self.bn1x1(self.conv1x1(x), train=train)
        o3 = self.bn3x3(self.conv3x3(x), train=train)
        o5 = self.bn5x5(self.conv5x5(x), train=train)
        o7 = self.bn7x7(self.conv7x7(x), train=train)
        out = jnp.concatenate([o1, o3, o5, o7], axis=-1)
        return self.bn_final(self.final_conv(out), train=train)


class Generator(nn.Module):
    """RCA-GAN generator (paper_gan.py:114-172)."""

    in_channels: int = 1
    out_channels: int = 1

    def setup(self):
        self.initial_conv = MultiScaleConv(64)
        self.denoising_blocks = [ConvBlock(64, name=f"denoising_blocks.{i}") for i in range(8)]
        self.one_conv_block = ConvBlock(64)
        self.cooperative_attention = CooperativeAttention(64)
        self.residual_blocks = [ResidualBlock(64, name=f"residual_blocks.{i}") for i in range(9)]
        deconvs = [DeconvBlock(64, 3, 1, 1, name=f"deconv_blocks.{i}") for i in range(4)]
        deconvs.append(DeconvBlock(self.out_channels, 1, 1, 0, name="deconv_blocks.4"))
        self.deconv_blocks = deconvs

    def __call__(self, x, train: bool = True):
        initial = self.initial_conv(x, train=train)
        d = initial
        for blk in self.denoising_blocks:
            d = blk(d, train=train)
        d = initial - d  # noise estimation (paper_gan.py:150-153)
        conv_out = self.one_conv_block(d, train=train)
        att = self.cooperative_attention(conv_out, train=train)
        r = att
        for blk in self.residual_blocks:
            r = blk(r, train=train)
        combined = r + conv_out  # skip from pre-attention conv output (:182-190)
        out = combined
        for blk in self.deconv_blocks:
            out = blk(out, train=train)
        return jnp.tanh(out + x)  # global residual + Tanh (:226-236)


class Discriminator(nn.Module):
    """WGAN critic (paper_gan.py:175-200).

    ``norm`` selects the conv-block normalization: "bn" is the reference
    architecture; "none"/"layernorm" are the controlled-ablation variants for the
    BatchNorm-critic divergence study (BN couples samples inside the per-sample
    WGAN-GP Lipschitz penalty)."""

    in_channels: int = 1
    norm: str = "bn"

    def setup(self):
        specs = [(64, 1), (64, 2), (128, 1), (128, 2), (256, 1), (256, 2)]
        self.conv_layers = [
            ConvBlock(c, 3, s, 1, norm=self.norm, name=f"conv_layers.{i}")
            for i, (c, s) in enumerate(specs)
        ]
        self.fc1 = TorchLinear(1024, name="fc_layers.0")
        self.fc2 = TorchLinear(1, name="fc_layers.2")

    def __call__(self, x, train: bool = True):
        for blk in self.conv_layers:
            x = blk(x, train=train)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(self.fc1(x))
        return self.fc2(x)
