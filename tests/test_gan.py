"""RCA-GAN tests: torch-layer parity, model shapes, loss semantics, one G/D step."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.models.rca_gan import (
    ChannelAttention,
    Discriminator,
    Generator,
)
from vub_image_denoising_tpu.nn.torch_layers import (
    TorchConv,
    TorchConvTranspose,
    TorchLinear,
)
from vub_image_denoising_tpu.train.gan_losses import (
    content_loss,
    gradient_penalty,
    gram_matrix,
    texture_loss,
)


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


def test_torch_conv_stride_padding_parity():
    x = _rand(2, 17, 17, 4)
    w = _rand(5, 5, 4, 6)
    b = _rand(6)
    mod = TorchConv(6, kernel_size=5, stride=2, padding=2, precision=jax.lax.Precision.HIGHEST)
    y = np.asarray(mod.apply({"params": {"kernel": jnp.array(w), "bias": jnp.array(b)}}, jnp.array(x)))
    yt = (
        F.conv2d(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w).permute(3, 2, 0, 1),
                 torch.tensor(b), stride=2, padding=2)
        .permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,p", [(3, 1), (1, 0)])
def test_torch_conv_transpose_stride1_parity(k, p):
    x = _rand(2, 9, 9, 4)
    w_torch = _rand(4, 6, k, k)  # (Cin, Cout, kh, kw)
    b = _rand(6)
    w_ours = np.transpose(w_torch, (2, 3, 0, 1))
    mod = TorchConvTranspose(6, kernel_size=k, padding=p, precision=jax.lax.Precision.HIGHEST)
    y = np.asarray(mod.apply({"params": {"kernel": jnp.array(w_ours), "bias": jnp.array(b)}}, jnp.array(x)))
    yt = (
        F.conv_transpose2d(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w_torch),
                           torch.tensor(b), stride=1, padding=p)
        .permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-5)


def test_torch_linear_parity():
    x = _rand(3, 10)
    w = _rand(10, 5)  # ours (in, out)
    b = _rand(5)
    mod = TorchLinear(5)
    y = np.asarray(mod.apply({"params": {"kernel": jnp.array(w), "bias": jnp.array(b)}}, jnp.array(x)))
    yt = F.linear(torch.tensor(x), torch.tensor(w.T), torch.tensor(b)).numpy()
    np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-5)


def test_channel_attention_formula():
    """mc = sigmoid(gamma/sqrt(var+eps) * (bn-mu)/sqrt(var+eps) + beta) * x with
    gamma=beta=0 -> mc = 0.5 everywhere."""
    mod = ChannelAttention(4)
    x = jnp.array(_rand(2, 8, 8, 4))
    vars_ = mod.init(jax.random.PRNGKey(0), x, train=False)
    y = mod.apply(vars_, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 0.5, rtol=1e-4, atol=1e-5)


def test_generator_output_range_and_shape():
    g = Generator(1, 1)
    x = jnp.array(_rand(2, 32, 32, 1)) * 0.1
    vars_ = g.init(jax.random.PRNGKey(0), x)
    y, _ = g.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 32, 32, 1)
    assert float(jnp.abs(y).max()) <= 1.0  # Tanh output


def test_discriminator_param_count_matches_reference_fc():
    """Linear(262144,1024) for 256^2 inputs (paper_gan.py:~190)."""
    d = Discriminator(1)
    dv = jax.eval_shape(
        lambda k: d.init(k, jnp.zeros((1, 256, 256, 1)), train=False), jax.random.PRNGKey(0)
    )
    fc0 = dv["params"]["fc_layers.0"]["kernel"]
    assert fc0.shape == (262144, 1024)


def test_discriminator_critic_norm_variants():
    """The WGAN-GP ablation knobs: norm='bn' (reference) keeps the exact .pth
    param names; 'none' drops normalization params entirely; 'layernorm' swaps
    in LN scale/bias.  Forward stays finite for all three."""
    x = jnp.array(_rand(2, 32, 32, 1)) * 0.1
    for norm, has_bn, has_ln in (("bn", True, False), ("none", False, False),
                                 ("layernorm", False, True)):
        d = Discriminator(1, norm=norm)
        dv = d.init(jax.random.PRNGKey(0), x, train=False)
        block0 = dv["params"]["conv_layers.0"]
        assert ("bn" in block0) == has_bn, (norm, list(block0))
        assert ("ln" in block0) == has_ln, (norm, list(block0))
        assert ("batch_stats" in dv) == has_bn
        if norm == "bn":  # .pth mapping unchanged for the reference arch
            assert set(block0["bn"]["stats"]) == {"scale", "bias"}
        out = d.apply(dv, x, train=False)
        assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError):
        Discriminator(1, norm="weightnorm").init(jax.random.PRNGKey(0), x, train=False)


def test_gram_matrix_matches_torch_reference():
    x = _rand(2, 4, 6, 3)  # NHWC
    g = np.asarray(gram_matrix(jnp.array(x)))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    a, b, c, d = xt.shape
    f = xt.reshape(a * b, c * d)
    gt = (f @ f.t() / (a * b * c * d)).numpy()
    np.testing.assert_allclose(g, gt, rtol=1e-5, atol=1e-6)


def test_content_loss_golden():
    a = jnp.ones((1, 4, 4, 1))
    b = jnp.zeros((1, 4, 4, 1))
    np.testing.assert_allclose(float(content_loss(a, b)), np.sqrt(1 + 1e-8), rtol=1e-6)


def test_gradient_penalty_linear_critic():
    """For D(x) = <w, x>, grad norm = ||w|| everywhere -> gp = lambda*(||w||-1)^2."""
    w = jnp.array(_rand(4, 4, 1)) * 0.3

    def d_apply(params, x):
        return jnp.sum(x * params, axis=(1, 2, 3), keepdims=False)[:, None]

    real = jnp.array(_rand(3, 4, 4, 1))
    fake = jnp.array(_rand(3, 4, 4, 1))
    gp = float(gradient_penalty(d_apply, w, jax.random.PRNGKey(0), real, fake, 10.0))
    expected = 10.0 * (np.linalg.norm(np.asarray(w).ravel()) - 1) ** 2
    np.testing.assert_allclose(gp, expected, rtol=1e-4)


def test_rca_gan_one_training_round(tmp_path):
    """One D step + one G step end-to-end on tiny shapes; losses finite, params move."""
    from vub_image_denoising_tpu.train.gan import RCAGANTrainer

    trainer = RCAGANTrainer(checkpoint_dir=str(tmp_path), disc_input_hw=32)
    sample = jnp.array(_rand(2, 32, 32, 1)) * 0.1
    state = trainer.init(jax.random.PRNGKey(0), sample, steps_per_epoch=1)
    degraded = jnp.array(_rand(2, 32, 32, 1)) * 0.1
    gt = jnp.array(_rand(2, 32, 32, 1)) * 0.1
    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()

    state, d_loss = trainer._jit_d_step(state, jax.random.PRNGKey(1), degraded, gt)
    state, g_loss, parts = trainer._jit_g_step(
        state, jax.random.PRNGKey(2), degraded, gt, trainer.vgg_params
    )
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))
    assert all(np.isfinite(float(v)) for v in parts.values())
    g1 = jax.tree_util.tree_leaves(state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))

    path = trainer.save_checkpoint(state, epoch=9)
    assert path.endswith("checkpoint_epoch_10.pth")
    import torch as _torch

    # must load under the safe weights-only default (no pickled optax trees)
    payload = _torch.load(path, map_location="cpu", weights_only=True)
    assert {"epoch", "generator_state_dict", "discriminator_state_dict",
            "optax_g_leaves", "optax_d_leaves"} <= set(payload)
    # the leaves rebuild into the trainer's own opt-state structure
    from vub_image_denoising_tpu.utils import checkpoint as _ckpt

    rebuilt = _ckpt.safe_to_optax_state(payload["optax_g_leaves"], state.g_opt)
    for a, b in zip(jax.tree_util.tree_leaves(rebuilt),
                    jax.tree_util.tree_leaves(state.g_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
