"""Core NN layers in TPU-native layout (NHWC activations, HWIO kernels).

These reproduce the exact math of the reference's torch layers
(reference: UNet/RDUNet_model.py:49-115) but are designed for the TPU:

- 3x3 convs go through ``lax.conv_general_dilated`` in NHWC/HWIO, which XLA tiles
  directly onto the MXU.
- The 2x2/stride-2 downsampling conv is algebraically a space-to-depth reshape followed
  by a (4*Cin -> Cout) matmul — we implement it that way so it is a single large MXU
  matmul instead of a strided conv.
- The 2x2/stride-2 transpose conv is a (Cin -> 4*Cout) matmul followed by
  depth-to-space — again one MXU matmul, bit-exact to torch's ConvTranspose2d(k=2,s=2).

Parameters are stored in float32; compute follows the input dtype (pass bf16 inputs to
run the net in bf16 on the MXU).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .init import (
    kaiming_uniform_a5_convt,
    prelu_alpha,
    torch_conv_bias,
    xavier_normal_conv,
)


class PReLU(nn.Module):
    """Per-channel PReLU, torch semantics (torch default alpha=0.25).

    Reference uses ``nn.PReLU(num_channels)`` throughout (UNet/RDUNet_model.py:54,63-64).
    """

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", prelu_alpha(0.25), (self.channels,), jnp.float32)
        alpha = alpha.astype(x.dtype)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class Conv3x3(nn.Module):
    """3x3 same-padding conv (torch Conv2d(k=3, padding=1) equivalent), NHWC/HWIO."""

    features: int
    kernel_size: int = 3
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", xavier_normal_conv, (k, k, cin, self.features), jnp.float32
        )
        bias = self.param(
            "bias", torch_conv_bias(cin * k * k), (self.features,), jnp.float32
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision,
        )
        return y + bias.astype(x.dtype)


class Downsample2x2(nn.Module):
    """2x2 stride-2 conv as space-to-depth + matmul (torch Conv2d(k=2,s=2) equivalent).

    Reference: DownsampleBlock's conv, UNet/RDUNet_model.py:52.
    out[n,i,j,o] = sum_{di,dj,c} w[di,dj,c,o] * x[n,2i+di,2j+dj,c]
    """

    features: int
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, cin = x.shape
        kernel = self.param(
            "kernel", xavier_normal_conv, (2, 2, cin, self.features), jnp.float32
        )
        bias = self.param(
            "bias", torch_conv_bias(cin * 4), (self.features,), jnp.float32
        )
        # space-to-depth with (di, dj, c) flattening order to match HWIO kernel reshape
        xs = x.reshape(n, h // 2, 2, w // 2, 2, cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * cin)
        wk = kernel.reshape(4 * cin, self.features).astype(x.dtype)
        y = jax.lax.dot_general(
            xs, wk, (((3,), (0,)), ((), ())), precision=self.precision
        )
        return y + bias.astype(x.dtype)


class Upsample2x2(nn.Module):
    """2x2 stride-2 transpose conv as matmul + depth-to-space.

    Torch ConvTranspose2d(Cin, Cout, k=2, s=2) equivalent
    (reference: UpsampleBlock's conv_t, UNet/RDUNet_model.py:62):
    out[n,2i+di,2j+dj,o] = sum_c x[n,i,j,c] * w_torch[c,o,di,dj].
    Our kernel layout is (di, dj, cin, cout) = torch weight transposed (2,3,0,1).
    """

    features: int
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, cin = x.shape
        kernel = self.param(
            "kernel",
            kaiming_uniform_a5_convt,
            (2, 2, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", torch_conv_bias(self.features * 4), (self.features,), jnp.float32
        )
        wk = (
            kernel.transpose(2, 0, 1, 3)  # (cin, di, dj, cout)
            .reshape(cin, 4 * self.features)
            .astype(x.dtype)
        )
        y = jax.lax.dot_general(
            x, wk, (((3,), (0,)), ((), ())), precision=self.precision
        )  # (n, h, w, 4*cout) ordered (di, dj, o)
        y = y.reshape(n, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, self.features)
        return y + bias.astype(x.dtype)
