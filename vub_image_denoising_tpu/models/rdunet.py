"""RDUNet — the flagship residual-dense U-Net denoiser, plus its time-conditioned twin.

Topology matches the reference exactly:
- ``RDUNet``  — reference UNet/RDUNet_model.py:117-186.  4 scales, two DenoisingBlocks
  per scale on both the encoder and decoder paths, global residual ``output + input``.
  base_filters=128 gives 166,375,174 params (paper config); base_filters=64 gives
  41,604,998 (verified by tests/test_models.py).
- ``RDUNetT`` — reference diffusion_denoising/Unet/Unet_model.py:92-166.  Same topology
  but the normalized timestep t is broadcast to an HxW plane and channel-concatenated to
  the input (so the input block sees channels+1), the output block always maps to 3
  channels, and the global residual adds the 3-channel image input.
  base_filters=32 gives 10,407,142 params.

Activations are NHWC; run in bf16 by passing bf16 inputs (params stay f32).
"""

import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import (
    DenoisingBlock,
    DownsampleBlock,
    InputBlock,
    OutputBlock,
    UpsampleBlock,
)


class _RDUNetCore(nn.Module):
    """Shared encoder/decoder trunk for RDUNet and RDUNetT.

    ``remat=True`` rematerializes each DenoisingBlock in the backward pass: on TPU
    the narrow-channel full-resolution activations are stored lane-padded (a
    bf16[N,256,256,16] residual costs 8x its logical bytes in HBM), so training at
    realistic batch sizes trades those stores for recompute — measured: the bf16
    train step at batch 32/256^2 OOMs 16GB HBM without it and fits with it.
    ``remat="highres"`` rematerializes only the scale-0/1 blocks — the ones whose
    stored activations dominate HBM (full/half resolution, maximally lane-padded)
    while being the cheapest fraction of total FLOPs to recompute; scales 2/3
    keep their (small) activations stored.
    """

    base_filters: int
    out_channels: int
    remat: object = False  # False | True | "highres"

    def setup(self):
        f0 = self.base_filters
        f1, f2, f3 = 2 * f0, 4 * f0, 8 * f0
        full = self.remat is True or self.remat == "all"
        Block = nn.remat(DenoisingBlock) if full else DenoisingBlock
        BlockHi = (
            nn.remat(DenoisingBlock) if (full or self.remat == "highres") else DenoisingBlock
        )

        self.input_block = InputBlock(f0)
        self.block_0_0 = BlockHi(f0, f0 // 2, f0)
        self.block_0_1 = BlockHi(f0, f0 // 2, f0)
        self.down_0 = DownsampleBlock(f1)

        self.block_1_0 = BlockHi(f1, f1 // 2, f1)
        self.block_1_1 = BlockHi(f1, f1 // 2, f1)
        self.down_1 = DownsampleBlock(f2)

        self.block_2_0 = Block(f2, f2 // 2, f2)
        self.block_2_1 = Block(f2, f2 // 2, f2)
        self.down_2 = DownsampleBlock(f3)

        self.block_3_0 = Block(f3, f3 // 2, f3)
        self.block_3_1 = Block(f3, f3 // 2, f3)

        self.up_2 = UpsampleBlock(f3, f2)
        self.block_2_2 = Block(f2, f2 // 2, f2)
        self.block_2_3 = Block(f2, f2 // 2, f2)

        self.up_1 = UpsampleBlock(f2, f1)
        self.block_1_2 = BlockHi(f1, f1 // 2, f1)
        self.block_1_3 = BlockHi(f1, f1 // 2, f1)

        self.up_0 = UpsampleBlock(f1, f0)
        self.block_0_2 = BlockHi(f0, f0 // 2, f0)
        self.block_0_3 = BlockHi(f0, f0 // 2, f0)

        self.output_block = OutputBlock(f0, self.out_channels)

    def __call__(self, x):
        out_0 = self.input_block(x)
        out_0 = self.block_0_0(out_0)
        out_0 = self.block_0_1(out_0)

        out_1 = self.down_0(out_0)
        out_1 = self.block_1_0(out_1)
        out_1 = self.block_1_1(out_1)

        out_2 = self.down_1(out_1)
        out_2 = self.block_2_0(out_2)
        out_2 = self.block_2_1(out_2)

        out_3 = self.down_2(out_2)
        out_3 = self.block_3_0(out_3)
        out_3 = self.block_3_1(out_3)

        out_4 = self.up_2(out_3, out_2)
        out_4 = self.block_2_2(out_4)
        out_4 = self.block_2_3(out_4)

        out_5 = self.up_1(out_4, out_1)
        out_5 = self.block_1_2(out_5)
        out_5 = self.block_1_3(out_5)

        out_6 = self.up_0(out_5, out_0)
        out_6 = self.block_0_2(out_6)
        out_6 = self.block_0_3(out_6)

        return self.output_block(out_6)


class RDUNet(nn.Module):
    """Supervised residual-dense U-Net denoiser; global residual ``core(x) + x``.

    Reference: UNet/RDUNet_model.py:117-186 (``RDUNet(channels=3, base_filters=64)``).
    """

    channels: int = 3
    base_filters: int = 64
    remat: object = False  # False | True | "highres" (see _RDUNetCore)

    def setup(self):
        self.core = _RDUNetCore(self.base_filters, self.channels, self.remat)

    def __call__(self, x):
        return self.core(x) + x


class RDUNetT(nn.Module):
    """Time-conditioned RDUNet for the interpolation-diffusion model.

    Reference: diffusion_denoising/Unet/Unet_model.py:92-166.  ``t`` is the normalized
    timestep: a scalar, a (N,) vector, or a full (N,H,W,1) plane; it is broadcast to one
    HxW channel plane and concatenated to the image.  Output is always 3 channels with a
    global residual on the 3-channel image input.
    """

    base_filters: int = 64
    out_channels: int = 3
    remat: object = False  # False | True | "highres" (see _RDUNetCore)

    def setup(self):
        self.core = _RDUNetCore(self.base_filters, self.out_channels, self.remat)

    def __call__(self, x, t):
        n, h, w, _ = x.shape
        t = jnp.asarray(t, x.dtype)
        if t.ndim <= 1:
            t_plane = jnp.broadcast_to(t.reshape(-1, 1, 1, 1), (n, h, w, 1))
        else:
            t_plane = jnp.broadcast_to(t.astype(x.dtype), (n, h, w, 1))
        xt = jnp.concatenate([x, t_plane], axis=-1)
        return self.core(xt) + x
