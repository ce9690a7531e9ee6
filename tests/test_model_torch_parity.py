"""FULL-MODEL forward parity against an independent torch implementation.

The round-1 parity evidence was per-primitive (test_layers_torch_parity.py); this
converts the 0.05 dB PSNR budget into per-model evidence: we build the reference
RDUNet / RDUNet_T architectures in torch from the SURVEY.md spec (reference:
UNet/RDUNet_model.py:117-186, diffusion_denoising/Unet/Unet_model.py:92-166 — written
here from the spec, not copied), initialize the JAX model, export its params through
utils/checkpoint.py's torch state_dict mapping with load_state_dict(strict=True)
(which also proves the key-name/layout mapping end to end), and assert the forward
outputs agree at f32.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu import enable_strict_precision
from vub_image_denoising_tpu.models import RDUNet, RDUNetT
from vub_image_denoising_tpu.utils.checkpoint import params_to_torch_state_dict


class TDenoisingBlock(tnn.Module):
    def __init__(self, c, inner, cout):
        super().__init__()
        self.conv_0 = tnn.Conv2d(c, inner, 3, padding=1)
        self.conv_1 = tnn.Conv2d(c + inner, inner, 3, padding=1)
        self.conv_2 = tnn.Conv2d(c + 2 * inner, inner, 3, padding=1)
        self.conv_3 = tnn.Conv2d(c + 3 * inner, cout, 3, padding=1)
        self.actv_0 = tnn.PReLU(inner)
        self.actv_1 = tnn.PReLU(inner)
        self.actv_2 = tnn.PReLU(inner)
        self.actv_3 = tnn.PReLU(cout)

    def forward(self, x):
        out0 = self.actv_0(self.conv_0(x))
        cat0 = torch.cat([x, out0], 1)
        out1 = self.actv_1(self.conv_1(cat0))
        cat1 = torch.cat([cat0, out1], 1)
        out2 = self.actv_2(self.conv_2(cat1))
        cat2 = torch.cat([cat1, out2], 1)
        out3 = self.actv_3(self.conv_3(cat2))
        return out3 + x


class TInputBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv_1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.conv_2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.actv_1 = tnn.PReLU(cout)
        self.actv_2 = tnn.PReLU(cout)

    def forward(self, x):
        return self.actv_2(self.conv_2(self.actv_1(self.conv_1(x))))


class TOutputBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv_1 = tnn.Conv2d(cin, cin, 3, padding=1)
        self.conv_2 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.actv_1 = tnn.PReLU(cin)
        self.actv_2 = tnn.PReLU(cout)

    def forward(self, x):
        return self.actv_2(self.conv_2(self.actv_1(self.conv_1(x))))


class TDown(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 2, stride=2)
        self.actv = tnn.PReLU(cout)

    def forward(self, x):
        return self.actv(self.conv(x))


class TUp(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv_t = tnn.ConvTranspose2d(cin, cin, 2, stride=2)
        self.actv_t = tnn.PReLU(cin)
        self.conv = tnn.Conv2d(cin + cout, cout, 3, padding=1)
        self.actv = tnn.PReLU(cout)

    def forward(self, upsample, concat):
        upsample = self.actv_t(self.conv_t(upsample))
        return self.actv(self.conv(torch.cat([concat, upsample], 1)))


class TRDUNetCore(tnn.Module):
    """Reference trunk (UNet/RDUNet_model.py:117-186), module names matching the
    flax param paths so checkpoint.py's state_dict maps with strict=True."""

    def __init__(self, cin, base, cout):
        super().__init__()
        f0, f1, f2, f3 = base, 2 * base, 4 * base, 8 * base
        self.input_block = TInputBlock(cin, f0)
        self.block_0_0 = TDenoisingBlock(f0, f0 // 2, f0)
        self.block_0_1 = TDenoisingBlock(f0, f0 // 2, f0)
        self.down_0 = TDown(f0, f1)
        self.block_1_0 = TDenoisingBlock(f1, f1 // 2, f1)
        self.block_1_1 = TDenoisingBlock(f1, f1 // 2, f1)
        self.down_1 = TDown(f1, f2)
        self.block_2_0 = TDenoisingBlock(f2, f2 // 2, f2)
        self.block_2_1 = TDenoisingBlock(f2, f2 // 2, f2)
        self.down_2 = TDown(f2, f3)
        self.block_3_0 = TDenoisingBlock(f3, f3 // 2, f3)
        self.block_3_1 = TDenoisingBlock(f3, f3 // 2, f3)
        self.up_2 = TUp(f3, f2)
        self.block_2_2 = TDenoisingBlock(f2, f2 // 2, f2)
        self.block_2_3 = TDenoisingBlock(f2, f2 // 2, f2)
        self.up_1 = TUp(f2, f1)
        self.block_1_2 = TDenoisingBlock(f1, f1 // 2, f1)
        self.block_1_3 = TDenoisingBlock(f1, f1 // 2, f1)
        self.up_0 = TUp(f1, f0)
        self.block_0_2 = TDenoisingBlock(f0, f0 // 2, f0)
        self.block_0_3 = TDenoisingBlock(f0, f0 // 2, f0)
        self.output_block = TOutputBlock(f0, cout)

    def forward(self, x):
        out_0 = self.block_0_1(self.block_0_0(self.input_block(x)))
        out_1 = self.block_1_1(self.block_1_0(self.down_0(out_0)))
        out_2 = self.block_2_1(self.block_2_0(self.down_1(out_1)))
        out_3 = self.block_3_1(self.block_3_0(self.down_2(out_2)))
        out_4 = self.block_2_3(self.block_2_2(self.up_2(out_3, out_2)))
        out_5 = self.block_1_3(self.block_1_2(self.up_1(out_4, out_1)))
        out_6 = self.block_0_3(self.block_0_2(self.up_0(out_5, out_0)))
        return self.output_block(out_6)


def test_rdunet_full_model_matches_torch():
    enable_strict_precision()
    base = 8
    model = RDUNet(channels=3, base_filters=base)
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_jax = np.asarray(model.apply(params, jnp.asarray(x)), np.float32)

    tmodel = TRDUNetCore(3, base, 3)
    sd = params_to_torch_state_dict(params)
    # flax paths include the 'core' wrapper which the converter strips
    tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()
    with torch.no_grad():
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        y_t = (tmodel(xt) + xt).permute(0, 2, 3, 1).numpy()  # global residual (:186)

    np.testing.assert_allclose(y_jax, y_t, rtol=2e-4, atol=2e-4)


def test_rdunet_t_full_model_matches_torch():
    enable_strict_precision()
    base = 8
    model = RDUNetT(base_filters=base)
    x = np.random.RandomState(2).randn(2, 64, 64, 3).astype(np.float32)
    t = np.asarray([0.25, 0.8], np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    y_jax = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t)), np.float32)

    tmodel = TRDUNetCore(4, base, 3)  # t-plane concat -> 4 input channels
    tmodel.load_state_dict(params_to_torch_state_dict(params), strict=True)
    tmodel.eval()
    with torch.no_grad():
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        tplane = torch.tensor(t).reshape(-1, 1, 1, 1).expand(-1, 1, 64, 64)
        xin = torch.cat([xt, tplane], 1)
        # reference residual adds the 3-ch image (Unet_model.py:166 broadcasting quirk
        # resolves to the image channels; our RDUNetT adds x explicitly)
        y_t = (tmodel(xin) + xt).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(y_jax, y_t, rtol=2e-4, atol=2e-4)
