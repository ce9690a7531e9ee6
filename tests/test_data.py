"""Data pipeline tests: noise quantization parity, normalization, datasets, loaders."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vub_image_denoising_tpu.data import (
    ArrayPatchDataset,
    FolderPatchDataset,
    PatchLoader,
    degrade_and_normalize,
    denormalize,
    load_data,
)
from vub_image_denoising_tpu.data.datasets import _index_patches
from vub_image_denoising_tpu.data.device import add_gaussian_noise_u8, normalize_u8


def _write_pngs(tmpdir, sizes, channels=3):
    from PIL import Image

    rng = np.random.RandomState(0)
    for i, (w, h) in enumerate(sizes):
        arr = rng.randint(0, 256, (h, w, channels), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(tmpdir, f"img_{i}.png"))


def test_patch_index_matches_reference_rule():
    # 600x520 image -> patches fully inside only: rows {0,256}, cols {0,256} -> 4
    coords = _index_patches((600, 520))
    assert coords == [(0, 0), (0, 256), (256, 0), (256, 256)]
    # exactly divisible
    assert len(_index_patches((512, 512))) == 4
    # too small -> none
    assert _index_patches((255, 300)) == []


def test_folder_dataset_length_is_patches_times_levels(tmp_path):
    _write_pngs(tmp_path, [(512, 512), (600, 300)])  # 4 + 2 patches
    ds = FolderPatchDataset(str(tmp_path), noise_levels=[15, 25, 50], use_rgb=True)
    assert len(ds.patches) == 6
    assert len(ds) == 18
    clean, sigma = ds[0]
    assert clean.shape == (256, 256, 3) and clean.dtype == np.uint8
    # noise index cycles fastest (custom_dataset.py:64-83)
    assert [ds[i][1] for i in range(3)] == [15.0, 25.0, 50.0]


def test_grayscale_mode(tmp_path):
    _write_pngs(tmp_path, [(256, 256)])
    ds = FolderPatchDataset(str(tmp_path), use_rgb=False)
    clean, _ = ds[0]
    assert clean.shape == (256, 256, 1)


def test_noise_quantization_matches_numpy_semantics():
    """Device noise must replicate clip(float+noise,0,255).astype(uint8) truncation."""
    clean = np.full((1, 8, 8, 1), 100, np.uint8)
    noisy = np.asarray(add_gaussian_noise_u8(jax.random.PRNGKey(0), jnp.array(clean), 25.0))
    assert noisy.dtype == np.uint8
    assert not np.all(noisy == clean)
    # statistical check: mean stays near 100, std near 25 (truncation-adjusted)
    big = np.zeros((4, 64, 64, 3), np.uint8) + 128
    noisy_big = np.asarray(
        add_gaussian_noise_u8(jax.random.PRNGKey(1), jnp.array(big), 25.0)
    ).astype(np.float64)
    assert abs(noisy_big.mean() - 128) < 1.0
    assert abs(noisy_big.std() - 25) < 1.5
    # clipping at the boundaries
    dark = np.zeros((1, 64, 64, 1), np.uint8)
    noisy_dark = np.asarray(add_gaussian_noise_u8(jax.random.PRNGKey(2), jnp.array(dark), 50.0))
    assert noisy_dark.min() == 0 and noisy_dark.max() <= 255


def test_normalize_roundtrip():
    u8 = jnp.arange(256, dtype=jnp.uint8).reshape(1, 16, 16, 1)
    x = normalize_u8(u8)
    assert float(x.min()) == -1.0 and float(x.max()) == pytest.approx(1.0)
    back = denormalize(x) * 255.0
    np.testing.assert_allclose(np.asarray(back).ravel(), np.arange(256), atol=1e-4)


def test_degrade_and_normalize_with_augment_shapes():
    clean = jnp.zeros((4, 32, 32, 3), jnp.uint8) + 128
    sigma = jnp.array([15.0, 25.0, 50.0, 25.0])
    noisy, cl = degrade_and_normalize(jax.random.PRNGKey(0), clean, sigma, augment=True)
    assert noisy.shape == cl.shape == (4, 32, 32, 3)
    assert noisy.dtype == jnp.float32
    assert float(jnp.abs(noisy).max()) <= 1.0 + 1e-5  # fp rounding in (x/255-.5)/.5


def test_patch_loader_batches_and_transform():
    rng = np.random.RandomState(0)
    noisy = rng.randint(0, 256, (10, 16, 16, 3), np.uint8)
    gt = rng.randint(0, 256, (10, 16, 16, 3), np.uint8)
    ds = ArrayPatchDataset(noisy, gt)

    def tf(key, n, g):
        return normalize_u8(n), normalize_u8(g)

    loader = PatchLoader(ds, batch_size=4, shuffle=True, transform=tf, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    for n, g in batches:
        assert n.shape == (4, 16, 16, 3)
        assert n.dtype == jnp.float32
    # epochs reshuffle deterministically per epoch index
    b1 = [np.asarray(b[0]) for b in loader]
    assert len(b1) == 2


def test_load_data_end_to_end(tmp_path):
    _write_pngs(tmp_path, [(512, 512), (512, 256)])  # 4+2=6 patches, x3 levels=18
    train_loader, val_loader = load_data(
        str(tmp_path), batch_size=2, num_workers=2, validation_split=0.25,
        dataset_percentage=1.0, use_rgb=True,
    )
    # 18 samples -> 14 train minus... int(0.75*18)=13 train, 5 val
    assert len(train_loader.dataset) == 13
    assert len(val_loader.dataset) == 5
    noisy, clean = next(iter(train_loader))
    assert noisy.shape == (2, 256, 256, 3)
    assert float(jnp.abs(noisy).max()) <= 1.0
    assert not np.allclose(np.asarray(noisy), np.asarray(clean))


def test_load_data_only_validation(tmp_path):
    _write_pngs(tmp_path, [(256, 256)])
    train_loader, val_loader = load_data(
        str(tmp_path), batch_size=1, only_validation=True, val_noise_levels=[25],
    )
    assert train_loader is None
    assert len(val_loader.dataset) == 1


def test_include_noise_level(tmp_path):
    _write_pngs(tmp_path, [(256, 256)])
    _, val = load_data(
        str(tmp_path), batch_size=1, only_validation=True,
        include_noise_level=True, val_noise_levels=[25],
    )
    noisy, clean, sigma = next(iter(val))
    assert float(sigma[0]) == 25.0
