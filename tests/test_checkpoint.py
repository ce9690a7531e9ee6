"""Checkpoint interop: .pth layout round-trips and orbax save/restore."""

import jax
import jax.numpy as jnp
import numpy as np

from vub_image_denoising_tpu.models import RDUNet, RDUNetT
from vub_image_denoising_tpu.utils import checkpoint as ckpt


def _small_rdunet():
    model = RDUNet(channels=3, base_filters=8)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_torch_state_dict_roundtrip_identity():
    model, params, x = _small_rdunet()
    sd = ckpt.params_to_torch_state_dict(params)
    # reference-style dotted names with torch layouts
    assert "input_block.conv_1.weight" in sd
    assert tuple(sd["input_block.conv_1.weight"].shape) == (8, 3, 3, 3)  # OIHW
    assert "input_block.actv_1.weight" in sd  # PReLU alpha
    assert tuple(sd["up_0.conv_t.weight"].shape) == (16, 16, 2, 2)  # (Cin,Cout,kh,kw)
    restored = ckpt.torch_state_dict_to_params(sd, params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_identical_after_roundtrip():
    model, params, _ = _small_rdunet()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    sd = ckpt.params_to_torch_state_dict(params)
    restored = ckpt.torch_state_dict_to_params(sd, params)
    np.testing.assert_allclose(
        np.asarray(model.apply(params, x)), np.asarray(model.apply(restored, x))
    )


def test_save_load_pth_file(tmp_path):
    model, params, _ = _small_rdunet()
    path = str(tmp_path / "ck.pth")
    ckpt.save_pth(path, params, epoch=7)
    restored, payload = ckpt.load_pth(path, params)
    assert payload["epoch"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_load_bare_pth(tmp_path):
    """Final-model layout: bare state_dict (diffusion_RDUnet.py:284-286)."""
    model, params, _ = _small_rdunet()
    path = str(tmp_path / "final.pth")
    ckpt.save_pth(path, params, bare=True)
    restored, payload = ckpt.load_pth(path, params)
    assert payload is None
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_diffusion_unet_prefix(tmp_path):
    """DiffusionModel checkpoints prefix model keys with 'unet.' (diffusion_RDUnet.py:174)."""
    model = RDUNetT(base_filters=8)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    sd = ckpt.params_to_torch_state_dict(params, prefix="unet.")
    assert all(k.startswith("unet.") for k in sd)
    path = str(tmp_path / "diff.pth")
    ckpt.save_pth(path, params, epoch=3, prefix="unet.")
    restored, payload = ckpt.load_pth(path, params, prefix="unet.")
    assert payload["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_roundtrip(tmp_path):
    _, params, _ = _small_rdunet()
    state = {"params": params, "epoch": jnp.asarray(4, jnp.int32)}
    path = str(tmp_path / "orbax_ck")
    ckpt.save_orbax(path, state)
    restored = ckpt.restore_orbax(path, state)
    assert int(restored["epoch"]) == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(state["params"]),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_upconv_transpose_conv_torch_layout():
    """upconvN modules (AttentionUNet/_UpconvN002, experimental UNet) are transpose
    convs: their exported torch weight must be ConvTranspose2d layout
    (Cin, Cout, kh, kw) and loading a real torch ConvTranspose2d weight must land
    in our (kh, kw, cin, cout) kernel — regression: only 'conv_t' names were
    recognized, breaking GAN checkpoint interop both ways."""
    import torch

    from vub_image_denoising_tpu.models.attention_unet import AttentionUNet
    from vub_image_denoising_tpu.nn.layers import Upsample2x2

    gen = AttentionUNet()
    x = jnp.zeros((1, 16, 16, 1))
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    sd = ckpt.params_to_torch_state_dict(variables)
    # ConvTranspose2d(512, 256, 2, 2) weight is (in=512, out=256, 2, 2)
    assert tuple(sd["upconv4.weight"].shape) == (512, 256, 2, 2), sd["upconv4.weight"].shape
    assert tuple(sd["upconv2.weight"].shape) == (128, 64, 2, 2)

    # layer-level forward parity against torch's ConvTranspose2d through the mapping
    import flax.linen as nn

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Upsample2x2(3, name="upconv9")(x)

    up = Wrap()
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 7, 4))
    uv = up.init(jax.random.PRNGKey(2), xs)
    tconv = torch.nn.ConvTranspose2d(4, 3, 2, stride=2)
    usd = ckpt.params_to_torch_state_dict(uv)
    tconv.load_state_dict({"weight": usd["upconv9.weight"], "bias": usd["upconv9.bias"]})
    want = tconv(torch.from_numpy(np.asarray(xs)).permute(0, 3, 1, 2))
    got = up.apply(uv, xs)
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )
    # and back: loading the torch weight reproduces our kernel exactly
    uv2 = ckpt.torch_state_dict_to_params(
        {"upconv9.weight": tconv.weight.detach(), "upconv9.bias": tconv.bias.detach()}, uv
    )
    for a, b in zip(jax.tree_util.tree_leaves(uv), jax.tree_util.tree_leaves(uv2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_batchnorm_running_stats_match_torch():
    """TorchBatchNorm accumulates the UNBIASED variance into running_var like
    torch.nn.BatchNorm2d (flax's nn.BatchNorm accumulates the biased one)."""
    import torch

    from vub_image_denoising_tpu.nn.torch_layers import TorchBatchNorm

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 5, 3)) * 2.0 + 1.0
    bn = TorchBatchNorm(3)
    variables = bn.init(jax.random.PRNGKey(1), x, train=True)
    y, mutated = bn.apply(variables, x, train=True, mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    yt = tbn(xt)
    np.testing.assert_allclose(
        np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-5, atol=1e-6,
    )
