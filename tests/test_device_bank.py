"""Device-resident dataset (data/resident.py) on the CPU mesh.

The bank lives in device memory and batches are sampled/cropped/transformed
in one jitted dispatch — correctness bars: crops really come from the bank,
epoch-folded determinism matches the PatchLoader convention, batches can be
born sharded, and both trainers consume the loader unchanged.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.data.resident import DeviceBankLoader


def _iota_bank(n=5, h=24, w=24, c=3):
    """image i = i*48 + row + col (values < 256): any crop of image i is an
    exact 2-D iota sheet, so a sampled patch betrays its source image and the
    crop offsets it claims (offsets sum to < 48, so images never alias)."""
    row = np.arange(h).reshape(h, 1)
    col = np.arange(w).reshape(1, w)
    base = (row + col)[None] + 48 * np.arange(n).reshape(n, 1, 1)
    assert base.max() < 256
    return np.repeat(base[..., None], c, axis=-1).astype(np.uint8)


def test_crops_come_from_the_bank():
    bank = _iota_bank()
    loader = DeviceBankLoader(bank, batch_size=16, patch=8, steps_per_epoch=2,
                              seed=3)
    seen_images = set()
    for batch in loader:
        arr = np.asarray(batch)
        assert arr.shape == (16, 8, 8, 3) and arr.dtype == np.uint8
        for p in arr:
            # iota structure: p[r,c] - p[0,0] == r + c for a genuine crop
            rr = np.arange(8).reshape(8, 1) + np.arange(8).reshape(1, 8)
            np.testing.assert_array_equal(
                p[..., 0].astype(np.int32) - int(p[0, 0, 0]), rr
            )
            img = int(p[0, 0, 0]) // 48
            off = int(p[0, 0, 0]) % 48
            assert 0 <= img < 5 and 0 <= off <= (24 - 8) * 2
            seen_images.add(img)
    assert len(seen_images) > 2, "sampler stuck on very few bank images"


def test_epoch_folding_matches_loader_convention():
    bank = _iota_bank()
    a = DeviceBankLoader(bank, batch_size=4, patch=8, steps_per_epoch=3, seed=0)
    b = DeviceBankLoader(bank, batch_size=4, patch=8, steps_per_epoch=3, seed=0)
    ea1, ea2 = [np.asarray(x) for x in a], [np.asarray(x) for x in a]
    eb1 = [np.asarray(x) for x in b]
    for x, y in zip(ea1, eb1):  # same seed+epoch -> identical batches
        np.testing.assert_array_equal(x, y)
    assert not all(np.array_equal(x, y) for x, y in zip(ea1, ea2)), (
        "epoch 0 and 1 sampled identically"
    )
    # resume convention: fast-forwarding .epoch reproduces the later epoch
    c = DeviceBankLoader(bank, batch_size=4, patch=8, steps_per_epoch=3, seed=0)
    c.epoch = 1
    for x, y in zip(ea2, [np.asarray(v) for v in c]):
        np.testing.assert_array_equal(x, y)


def test_batches_born_sharded_and_transform_applied():
    from vub_image_denoising_tpu.data.device import degrade_and_normalize
    from vub_image_denoising_tpu.parallel import make_mesh
    from vub_image_denoising_tpu.parallel.mesh import shard_batch

    mesh = make_mesh()
    sh = shard_batch(mesh)
    bank = _iota_bank(h=16, w=16)

    def tf(key, clean_u8):
        return degrade_and_normalize(key, clean_u8, 25.0)

    loader = DeviceBankLoader(bank, batch_size=16, transform=tf,
                              steps_per_epoch=1, sharding=sh, seed=1)
    (noisy, clean), = list(loader)
    assert noisy.shape == clean.shape == (16, 16, 16, 3)
    assert noisy.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(clean))) <= 1.0
    ndev = len(mesh.devices.ravel())
    shapes = {s.data.shape for s in noisy.addressable_shards}
    assert shapes == {(16 // ndev, 16, 16, 3)}, shapes
    # noise actually applied, normalization consistent
    assert float(jnp.mean(jnp.abs(noisy - clean))) > 1e-3


def test_trainer_consumes_device_bank_loader():
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.train import SupervisedTrainer
    from vub_image_denoising_tpu.data.device import degrade_and_normalize

    bank = _iota_bank(n=4, h=16, w=16)
    loader = DeviceBankLoader(
        bank, batch_size=4,
        transform=lambda k, x: degrade_and_normalize(k, x, 25.0),
        steps_per_epoch=2, seed=0,
    )
    model = RDUNet(channels=3, base_filters=4)
    tr = SupervisedTrainer(model, lr=1e-3, accumulation_steps=1)
    state = tr.init(jax.random.PRNGKey(0), jnp.zeros((4, 16, 16, 3)),
                    steps_per_epoch=len(loader))
    state, loss = tr.train_epoch(state, loader, epoch=0)
    assert np.isfinite(loss)


def test_rejects_bad_bank_and_patch():
    import pytest

    with pytest.raises(ValueError, match="uint8"):
        DeviceBankLoader(np.zeros((2, 8, 8, 3), np.float32), batch_size=2)
    with pytest.raises(ValueError, match="exceeds"):
        DeviceBankLoader(np.zeros((2, 8, 8, 3), np.uint8), batch_size=2,
                         patch=16)


def _write_pngs(folder, sizes):
    from PIL import Image

    rng = np.random.RandomState(7)
    for i, (w, h) in enumerate(sizes):
        arr = rng.randint(0, 256, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(f"{folder}/img_{i}.png")


def test_device_val_loader_matches_host_loader_bytes(tmp_path):
    """Sequential device-bank validation batches must be BYTE-IDENTICAL to the
    host PatchLoader's (same split, same key convention, same on-device
    transform) — the strongest possible equivalence for the resident path."""
    from vub_image_denoising_tpu.data.loader import load_data

    _write_pngs(tmp_path, [(512, 256)])  # 2 patches x 3 levels = 6 logical
    key = jax.random.PRNGKey(5)
    _, host = load_data(str(tmp_path), batch_size=2, only_validation=True,
                        use_rgb=True, key=key)
    _, dev = load_data(str(tmp_path), batch_size=2, only_validation=True,
                       use_rgb=True, key=key, device_data=True)
    hb, db = list(host), list(dev)
    assert len(hb) == len(db) == 3
    for (n1, c1), (n2, c2) in zip(hb, db):
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_device_train_loader_covers_the_split(tmp_path):
    """Permute mode must cover the train split's (patch x sigma) logical space
    exactly once per epoch: sigma and clean-patch multisets match the host
    split (order differs — numpy vs on-device shuffle)."""
    from vub_image_denoising_tpu.data.loader import load_data

    _write_pngs(tmp_path, [(512, 512)])  # 4 patches x 3 levels = 12 logical
    kw = dict(batch_size=3, validation_split=0.5, use_rgb=True, seed=2,
              include_noise_level=True)
    th, _ = load_data(str(tmp_path), **kw)
    td, _ = load_data(str(tmp_path), device_data=True, **kw)
    assert len(th) == len(td) == 2  # 6 train logical / batch 3

    def collect(loader):
        sig, cleans = [], []
        for _, clean, sigma in loader:
            sig.extend(np.asarray(sigma, np.float32).tolist())
            cleans.extend(np.asarray(clean).tobytes() for clean in clean)
        return sorted(sig), sorted(cleans)

    sig_h, clean_h = collect(th)
    sig_d, clean_d = collect(td)
    assert sig_h == sig_d
    assert clean_h == clean_d


def test_diffusion_cli_device_data_rejects_sidd():
    import pytest

    from vub_image_denoising_tpu.train.diffusion import (
        build_arg_parser,
        load_data_for,
    )

    args = build_arg_parser().parse_args(
        ["--dataset_choice", "SIDD", "--device-data"]
    )
    with pytest.raises(ValueError, match="DIV2K only"):
        load_data_for(args)


def test_permute_small_split_falls_back_to_short_batch():
    """batch_size > n_logical must match PatchLoader's short-batch policy
    (warn + one short batch per epoch), not crash at construction."""
    import pytest

    bank = _iota_bank(n=5)
    with pytest.warns(UserWarning, match="short batch"):
        loader = DeviceBankLoader(bank, batch_size=16, mode="permute", seed=0)
    assert len(loader) == 1
    (batch,) = list(loader)
    assert batch.shape == (5, 24, 24, 3)
    # every bank image appears exactly once (it IS a permutation)
    firsts = sorted(int(p[0, 0, 0]) // 48 for p in np.asarray(batch))
    assert firsts == [0, 1, 2, 3, 4]
