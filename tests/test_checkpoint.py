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
