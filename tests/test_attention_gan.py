"""Attention-U-Net GAN tests: shapes, losses, one full G/D round."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.models.attention_unet import AttentionUNet, PatchGAN
from vub_image_denoising_tpu.train.denoising_gan import (
    DenoisingGANTrainer,
    bce,
    conditional_gradient_penalty,
    edge_loss,
    sobel_edges,
)


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


def test_attention_unet_shape_and_tanh_range():
    g = AttentionUNet()
    x = jnp.array(_rand(2, 32, 32, 1)) * 0.1
    v = g.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = g.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 32, 32, 1)
    assert float(jnp.abs(y).max()) <= 1.0


def test_patchgan_downsampling_shape():
    """3 stride-2 convs + 2 stride-1 k4p1 convs: 64 -> 8 -> 7 -> 6."""
    d = PatchGAN(2)
    x = jnp.zeros((1, 64, 64, 2))
    v = d.init(jax.random.PRNGKey(0), x, train=False)
    y = d.apply(v, x, train=False)
    assert y.shape == (1, 6, 6, 1)
    assert 0.0 <= float(y.min()) and float(y.max()) <= 1.0  # sigmoid


def test_sobel_matches_torch():
    x = _rand(2, 16, 16, 1)
    got = np.asarray(sobel_edges(jnp.array(x)))
    kx = torch.tensor([[1., 0, -1], [2, 0, -2], [1, 0, -1]]).reshape(1, 1, 3, 3)
    ky = torch.tensor([[1., 2, 1], [0, 0, 0], [-1, -2, -1]]).reshape(1, 1, 3, 3)
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    gx = F.conv2d(xt, kx, padding=1)
    gy = F.conv2d(xt, ky, padding=1)
    want = torch.sqrt(gx**2 + gy**2 + 1e-6).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bce_matches_torch_with_smoothing():
    p = np.random.RandomState(0).rand(4, 6, 6, 1).astype(np.float32) * 0.98 + 0.01
    got = float(bce(jnp.array(p), 0.9))
    want = float(torch.nn.functional.binary_cross_entropy(
        torch.tensor(p), torch.full_like(torch.tensor(p), 0.9)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_conditional_gp_linear_critic():
    w = jnp.array(_rand(4, 4, 2)) * 0.2

    def d_apply(params, z):  # z has 2 channels (noisy, interp)
        return jnp.sum(z * params, axis=(1, 2, 3))[:, None]

    noisy = jnp.array(_rand(3, 4, 4, 1))
    real = jnp.array(_rand(3, 4, 4, 1))
    fake = jnp.array(_rand(3, 4, 4, 1))
    gp = float(conditional_gradient_penalty(d_apply, w, jax.random.PRNGKey(0), noisy, real, fake))
    expected = (np.linalg.norm(np.asarray(w).ravel()) - 1) ** 2
    np.testing.assert_allclose(gp, expected, rtol=1e-4)


def test_denoising_gan_one_round(tmp_path):
    trainer = DenoisingGANTrainer(checkpoint_dir=str(tmp_path))
    sample = jnp.array(_rand(2, 32, 32, 1)) * 0.1
    state = trainer.init(jax.random.PRNGKey(0), sample, steps_per_epoch=1)
    noisy = jnp.array(_rand(2, 32, 32, 1)) * 0.1
    clean = jnp.array(_rand(2, 32, 32, 1)) * 0.1
    state, d_loss = trainer._jit_d_step(state, jax.random.PRNGKey(1), noisy, clean)
    state, g_loss, parts = trainer._jit_g_step(
        state, jax.random.PRNGKey(2), noisy, clean, trainer.vgg_params
    )
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))
    gpath, dpath = trainer.save_checkpoint(state, epoch=10)
    assert gpath.endswith("denoising_gan_generator_10.pth")
    payload = torch.load(gpath, map_location="cpu", weights_only=False)
    assert any(k.startswith("enc1") for k in payload)
