"""End-user denoise CLI: checkpoint -> padded forward -> PNG, both archs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vub_image_denoising_tpu.eval.denoise_cli import build_denoiser, main
from vub_image_denoising_tpu.models.rdunet import RDUNet, RDUNetT
from vub_image_denoising_tpu.utils import checkpoint as ckpt_io


def _save_rdunet_ckpt(path, base_filters=4, channels=3):
    model = RDUNet(channels=channels, base_filters=base_filters)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, channels)))
    ckpt_io.save_pth(path, params, epoch=1)
    return model, params


def _write_png(path, h, w, channels=3, seed=0):
    from PIL import Image

    arr = np.random.RandomState(seed).randint(0, 256, (h, w, channels), np.uint8)
    Image.fromarray(arr[..., 0] if channels == 1 else arr).save(path)
    return arr


def test_build_denoiser_matches_direct_forward(tmp_path):
    ck = str(tmp_path / "m.pth")
    model, params = _save_rdunet_ckpt(ck)
    fn = build_denoiser(ck, arch="rdunet", base_filters=4)
    x = np.random.RandomState(1).rand(24, 16, 3).astype(np.float32) * 2 - 1
    got = np.asarray(fn(x))
    assert got.shape == x.shape  # 24 is /8, 16 is /8: no padding involved
    ref = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)[None]))[0]
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_denoise_cli_single_file_odd_size(tmp_path):
    ck = str(tmp_path / "m.pth")
    _save_rdunet_ckpt(ck)
    src = str(tmp_path / "in.png")
    _write_png(src, 37, 51)  # not divisible by 8: exercises reflect padding
    out = str(tmp_path / "out.png")
    main(["--checkpoint", ck, "--base-filters", "4", "--input", src, "--output", out])
    from PIL import Image

    arr = np.asarray(Image.open(out))
    assert arr.shape == (37, 51, 3) and arr.dtype == np.uint8


def test_denoise_cli_folder_default_output(tmp_path):
    ck = str(tmp_path / "m.pth")
    _save_rdunet_ckpt(ck)
    src_dir = tmp_path / "imgs"
    src_dir.mkdir()
    for i in range(2):
        _write_png(str(src_dir / f"a{i}.png"), 16, 16, seed=i)
    main(["--checkpoint", ck, "--base-filters", "4", "--input", str(src_dir)])
    out_dir = str(src_dir) + "_denoised"
    assert sorted(os.listdir(out_dir)) == ["a0.png", "a1.png"]


def test_denoise_cli_diffusion_arch(tmp_path):
    unet = RDUNetT(base_filters=4)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,))
    )
    ck = str(tmp_path / "d.pth")
    ckpt_io.save_pth(ck, params, prefix="unet.", epoch=1)
    fn = build_denoiser(ck, arch="diffusion", base_filters=4, timesteps=2)
    x = np.random.RandomState(2).rand(16, 16, 3).astype(np.float32) * 2 - 1
    got = np.asarray(fn(x))
    assert got.shape == x.shape and np.isfinite(got).all()


def test_tile_parallel_matches_single_device(tmp_path):
    ck = str(tmp_path / "m.pth")
    _save_rdunet_ckpt(ck)
    n = len(jax.devices())
    # H divisible by n_devices*8 and W by 8: no padding on either path, so the
    # row-sharded (halo-exchanged) result must match the one-device forward
    h, w = max(n, 2) * 8 * 2, 16
    x = np.random.RandomState(3).rand(h, w, 3).astype(np.float32) * 2 - 1
    ref = np.asarray(build_denoiser(ck, arch="rdunet", base_filters=4)(x))
    got = np.asarray(
        build_denoiser(ck, arch="rdunet", base_filters=4, tile_parallel=True)(x)
    )
    assert got.shape == (h, w, 3)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_tensor_parallel_matches_single_device(tmp_path):
    ck = str(tmp_path / "m.pth")
    _save_rdunet_ckpt(ck, base_filters=8)  # channels divide the 8-way model axis
    x = np.random.RandomState(4).rand(24, 16, 3).astype(np.float32) * 2 - 1
    ref = np.asarray(build_denoiser(ck, arch="rdunet", base_filters=8)(x))
    got = np.asarray(
        build_denoiser(ck, arch="rdunet", base_filters=8, tensor_parallel=True)(x)
    )
    assert got.shape == x.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_tile_and_tensor_parallel_are_exclusive(tmp_path):
    ck = str(tmp_path / "m.pth")
    _save_rdunet_ckpt(ck)
    with pytest.raises(ValueError):
        build_denoiser(ck, arch="rdunet", base_filters=4,
                       tile_parallel=True, tensor_parallel=True)


def test_unknown_arch_raises(tmp_path):
    ck = str(tmp_path / "m.pth")
    _save_rdunet_ckpt(ck)
    with pytest.raises(ValueError):
        build_denoiser(ck, arch="nope")
