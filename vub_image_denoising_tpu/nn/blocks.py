"""RDUNet block zoo — single implementation shared by all models.

The reference duplicates these blocks across UNet/RDUNet_model.py:49-115 and
diffusion_denoising/Unet/Unet_model.py:23-89 (byte-identical); here there is exactly one
copy.  Submodule names intentionally mirror the torch attribute names so the .pth
checkpoint converter (utils/checkpoint.py) is a mechanical rename.
"""

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv3x3, Downsample2x2, PReLU, Upsample2x2


class DownsampleBlock(nn.Module):
    """conv(k2,s2) + PReLU.  Reference: UNet/RDUNet_model.py:49-56."""

    out_channels: int

    def setup(self):
        self.conv = Downsample2x2(self.out_channels)
        self.actv = PReLU(self.out_channels)

    def __call__(self, x):
        return self.actv(self.conv(x))


class UpsampleBlock(nn.Module):
    """convT(k2,s2)+PReLU, concat skip, conv3x3+PReLU.

    Reference: UNet/RDUNet_model.py:58-69.  Note the concat order: the skip tensor
    comes FIRST (torch.cat([concat, upsample], 1)).
    """

    in_channels: int
    out_channels: int

    def setup(self):
        self.conv_t = Upsample2x2(self.in_channels)
        self.actv_t = PReLU(self.in_channels)
        self.conv = Conv3x3(self.out_channels)
        self.actv = PReLU(self.out_channels)

    def __call__(self, upsample, concat):
        upsample = self.actv_t(self.conv_t(upsample))
        return self.actv(self.conv(jnp.concatenate([concat, upsample], axis=-1)))


class InputBlock(nn.Module):
    """2x (conv3x3 + PReLU).  Reference: UNet/RDUNet_model.py:71-81."""

    out_channels: int

    def setup(self):
        self.conv_1 = Conv3x3(self.out_channels)
        self.conv_2 = Conv3x3(self.out_channels)
        self.actv_1 = PReLU(self.out_channels)
        self.actv_2 = PReLU(self.out_channels)

    def __call__(self, x):
        x = self.actv_1(self.conv_1(x))
        return self.actv_2(self.conv_2(x))


class OutputBlock(nn.Module):
    """conv3x3+PReLU (width in_channels) then conv3x3+PReLU to out_channels.

    Reference: UNet/RDUNet_model.py:83-93.
    """

    in_channels: int
    out_channels: int

    def setup(self):
        self.conv_1 = Conv3x3(self.in_channels)
        self.conv_2 = Conv3x3(self.out_channels)
        self.actv_1 = PReLU(self.in_channels)
        self.actv_2 = PReLU(self.out_channels)

    def __call__(self, x):
        x = self.actv_1(self.conv_1(x))
        return self.actv_2(self.conv_2(x))


class DenoisingBlock(nn.Module):
    """4-layer residual-dense block with channel-concat growth.

    Reference: UNet/RDUNet_model.py:95-115.  Each conv sees the concat of the block
    input and all previous conv outputs; the final conv output is residually added to
    the block input.
    """

    in_channels: int
    inner_channels: int
    out_channels: int

    def setup(self):
        self.conv_0 = Conv3x3(self.inner_channels)
        self.conv_1 = Conv3x3(self.inner_channels)
        self.conv_2 = Conv3x3(self.inner_channels)
        self.conv_3 = Conv3x3(self.out_channels)
        self.actv_0 = PReLU(self.inner_channels)
        self.actv_1 = PReLU(self.inner_channels)
        self.actv_2 = PReLU(self.inner_channels)
        self.actv_3 = PReLU(self.out_channels)

    def __call__(self, x):
        out_0 = self.actv_0(self.conv_0(x))
        cat_0 = jnp.concatenate([x, out_0], axis=-1)
        out_1 = self.actv_1(self.conv_1(cat_0))
        cat_1 = jnp.concatenate([cat_0, out_1], axis=-1)
        out_2 = self.actv_2(self.conv_2(cat_1))
        cat_2 = jnp.concatenate([cat_1, out_2], axis=-1)
        out_3 = self.actv_3(self.conv_3(cat_2))
        return out_3 + x
