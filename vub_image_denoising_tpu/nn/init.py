"""Initializers reproducing the reference's PyTorch weight-init semantics.

The reference applies ``init_weights('xavier')`` to every module whose class name
contains ``Conv2d`` (reference: UNet/RDUNet_model.py:31-47 and
diffusion_denoising/Unet/Unet_model.py:4-21).  Notes on the exact semantics we match:

- ``nn.Conv2d`` weights   -> xavier_normal_, std = sqrt(2 / (fan_in + fan_out)) with
  torch fan conventions fan_in = Cin*kh*kw, fan_out = Cout*kh*kw.
- ``nn.Conv2d`` biases    -> NOT touched by init_weights; they keep the torch default
  U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
- ``nn.ConvTranspose2d``  -> class name does NOT contain the substring 'Conv2d'
  ("ConvTranspose2d".find('Conv2d') == -1), so transpose convs keep the torch defaults:
  kaiming_uniform_(a=sqrt(5)) on the weight (bound = 1/sqrt(fan_in) with
  fan_in = weight.size(1)*kh*kw) and the same uniform bias rule.
- ``nn.PReLU``            -> constant 0.25 per channel (torch default).

All kernels here are stored HWIO (kh, kw, cin, cout) — the TPU/XLA-native layout.
"""

import math

import jax
import jax.numpy as jnp


def xavier_normal_conv(key, shape, dtype=jnp.float32):
    """Xavier-normal for an HWIO conv kernel with torch fan conventions."""
    kh, kw, cin, cout = shape
    fan_in = cin * kh * kw
    fan_out = cout * kh * kw
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform_a5_convt(key, shape, dtype=jnp.float32):
    """Torch default ConvTranspose2d weight init (kaiming_uniform_, a=sqrt(5)).

    ``shape`` is our transpose-conv kernel layout (kh, kw, cin, cout).  Torch computes
    fan_in from weight.size(1) which for ConvTranspose2d(Cin, Cout, k) is Cout, so
    fan_in = cout*kh*kw; gain = sqrt(2/(1+5)); bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in).
    """
    kh, kw, cin, cout = shape
    fan_in = cout * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_bias(fan_in):
    """Torch default conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def prelu_alpha(value=0.25):
    """Torch default PReLU slope: constant 0.25 per channel."""

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init
