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


class _TorchBNCore(nn.Module):
    """Manual BN core (named 'stats' to keep the checkpoint path convention)."""

    features: int
    momentum: float
    epsilon: float

    @nn.compact
    def __call__(self, x, train: bool):
        f = self.features
        scale = self.param("scale", nn.initializers.ones_init(), (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (f,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((f,), jnp.float32))
        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)  # biased: normalizes
            if not self.is_initializing():
                # torch accumulates the UNBIASED (m/(m-1)) variance into running_var
                # (BatchNorm2d docs) while normalizing with the biased one; flax's
                # nn.BatchNorm accumulates the biased value — a (m-1)/m systematic
                # drift visible when exporting to the torch reference for eval
                m = x.size // x.shape[-1]
                unbiased = var * (m / max(m - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class TorchBatchNorm(nn.Module):
    """torch.nn.BatchNorm2d equivalent: eps 1e-5, torch momentum 0.1, and the
    torch running-stat convention (unbiased variance accumulated, biased used for
    normalization) — see _TorchBNCore."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        return _TorchBNCore(self.features, 0.1, 1e-5, name="stats")(x, train)


def leaky_relu(x, slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def max_pool_2x2(x):
    """torch MaxPool2d(2) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
