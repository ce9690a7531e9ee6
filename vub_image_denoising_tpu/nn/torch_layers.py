"""Torch-semantics layers used by the GAN family (NHWC/HWIO, TPU layouts).

The RCA-GAN and attention-U-Net GAN (recovered from __pycache__/paper_gan.pyc and
__pycache__/train_denoising_gan.pyc) use plain torch Conv2d/ConvTranspose2d/BatchNorm2d/
Linear with defaults; these modules reproduce that math exactly so the .pth converter
stays mechanical.  Initialization follows paper_gan.weights_init (bytecode line 333):
kaiming_normal_(a=0, fan_in, leaky_relu) on Conv/Linear weights, BatchNorm weight=1
bias=0; biases keep the torch default U(+-1/sqrt(fan_in)).
"""

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .init import torch_conv_bias


def kaiming_normal_conv(key, shape, dtype=jnp.float32):
    """kaiming_normal_(a=0, mode='fan_in') on an HWIO kernel: std = sqrt(2/fan_in)."""
    kh, kw, cin, cout = shape
    std = math.sqrt(2.0 / (cin * kh * kw))
    return std * jax.random.normal(key, shape, dtype)


def kaiming_normal_dense(key, shape, dtype=jnp.float32):
    """kaiming_normal_ for a dense kernel stored (in, out): std = sqrt(2/fan_in)."""
    fan_in = shape[0]
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class TorchConv(nn.Module):
    """torch.nn.Conv2d(features, kernel_size, stride, padding) equivalent."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal_conv, (kh, kw, cin, self.features), jnp.float32)
        ph, pw = _pair(self.padding)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), _pair(self.stride),
            [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=self.precision,
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_bias(cin * kh * kw), (self.features,), jnp.float32)
            y = y + bias.astype(x.dtype)
        return y


class TorchConvTranspose(nn.Module):
    """torch.nn.ConvTranspose2d equivalent for stride 1 (k3/p1 and k1/p0 cases).

    For stride 1, conv_transpose(x, w) == conv(x, rot180(w)) with padding k-1-p.
    Kernel stored (kh, kw, cin, cout) = torch weight (Cin, Cout, kh, kw).transpose(2,3,0,1);
    the 'conv_t' path-name convention keeps the checkpoint converter's layout rule.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    padding: Union[int, Tuple[int, int]] = 1
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1]

        def init(key, shape, dtype=jnp.float32):
            # torch ConvTranspose default fan_in = Cout*kh*kw; weights_init overrides
            # with kaiming fan_in (= size(1)*k*k = Cout*k*k for transpose weights)
            std = math.sqrt(2.0 / (self.features * kh * kw))
            return std * jax.random.normal(key, shape, dtype)

        kernel = self.param("kernel", init, (kh, kw, cin, self.features), jnp.float32)
        bias = self.param(
            "bias", torch_conv_bias(self.features * kh * kw), (self.features,), jnp.float32
        )
        ph, pw = _pair(self.padding)
        w = kernel[::-1, ::-1, :, :].astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=self.precision,
        )
        return y + bias.astype(x.dtype)


class TorchLinear(nn.Module):
    """torch.nn.Linear equivalent; kernel stored (in, out)."""

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal_dense, (cin, self.features), jnp.float32)
        bias = self.param("bias", torch_conv_bias(cin), (self.features,), jnp.float32)
        return x @ kernel.astype(x.dtype) + bias.astype(x.dtype)


class TorchBatchNorm(nn.Module):
    """torch.nn.BatchNorm2d equivalent (momentum 0.1 torch = 0.9 flax, eps 1e-5)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=x.dtype, name="stats",
        )
        return bn(x)


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def max_pool_2x2(x):
    """torch MaxPool2d(2) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
