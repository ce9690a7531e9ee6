"""Native host-runtime tests: C++ patch gather, decode cache, loader fast path.

The gather kernel (native/patchio.cpp via ctypes) and the byte-budgeted decode
LRU (data/datasets.py::DecodeCache) must be invisible to users: every batched
path has to produce byte-identical results to the per-item __getitem__ +
collate path they replace.
"""

import os

import numpy as np
import pytest

from vub_image_denoising_tpu.data import FolderPatchDataset, PatchLoader
from vub_image_denoising_tpu.data.datasets import DecodeCache
from vub_image_denoising_tpu.native import (
    _gather_numpy,
    gather_patches,
    native_available,
)


def _write_pngs(tmpdir, sizes, channels=3, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    for i, (w, h) in enumerate(sizes):
        arr = rng.randint(0, 256, (h, w, channels), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(tmpdir, f"img_{i}.png"))


def _random_frames(rng, n, channels):
    frames, tops, lefts = [], [], []
    for _ in range(n):
        h, w = rng.randint(40, 200), rng.randint(40, 200)
        frames.append(rng.randint(0, 256, (h, w, channels), dtype=np.uint8))
        tops.append(rng.randint(0, h - 32 + 1))
        lefts.append(rng.randint(0, w - 32 + 1))
    return frames, tops, lefts


def test_native_builds_on_this_toolchain():
    # g++ is part of this environment; the ctypes binding must come up for real
    # (the numpy fallback exists for toolchain-less deployments, not for CI).
    assert native_available()


@pytest.mark.parametrize("channels", [1, 3])
def test_native_gather_matches_numpy(channels):
    rng = np.random.RandomState(7 + channels)
    frames, tops, lefts = _random_frames(rng, 17, channels)
    ref = _gather_numpy(frames, tops, lefts, 32)
    out = gather_patches(frames, tops, lefts, 32)
    assert out.shape == (17, 32, 32, channels) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, ref)


def test_native_gather_duplicate_frames_and_single_thread():
    rng = np.random.RandomState(3)
    frame = rng.randint(0, 256, (300, 300, 3), dtype=np.uint8)
    frames = [frame] * 64  # the common case: many patches of one cached image
    tops = list(rng.randint(0, 300 - 64, 64))
    lefts = list(rng.randint(0, 300 - 64, 64))
    ref = _gather_numpy(frames, tops, lefts, 64)
    np.testing.assert_array_equal(gather_patches(frames, tops, lefts, 64), ref)
    np.testing.assert_array_equal(
        gather_patches(frames, tops, lefts, 64, n_threads=1), ref
    )


def test_gather_falls_back_on_noncontiguous_rows():
    rng = np.random.RandomState(5)
    big = rng.randint(0, 256, (128, 128, 6), dtype=np.uint8)
    view = big[:, :, ::2]  # stride along C: exotic layout must hit the fallback
    ref = _gather_numpy([view], [10], [20], 32)
    np.testing.assert_array_equal(gather_patches([view], [10], [20], 32), ref)


def test_decode_cache_hits_and_eviction():
    calls = []

    def make_decoder(key, nbytes):
        def decode():
            calls.append(key)
            return np.full((nbytes,), key, np.uint8).reshape(1, nbytes, 1)

        return decode

    cache = DecodeCache(budget_bytes=250)
    for key in (1, 2, 1, 1):  # second/third 1-lookups must hit
        cache.get(key, make_decoder(key, 100))
    assert calls == [1, 2]
    assert cache.hits == 2 and cache.misses == 2
    cache.get(3, make_decoder(3, 100))  # evicts LRU key 2
    cache.get(2, make_decoder(2, 100))
    assert calls == [1, 2, 3, 2]
    # budget 0 disables caching entirely
    off = DecodeCache(budget_bytes=0)
    off.get(9, make_decoder(9, 10))
    off.get(9, make_decoder(9, 10))
    assert calls[-2:] == [9, 9]


def test_folder_gather_batch_matches_itemwise(tmp_path):
    _write_pngs(tmp_path, [(512, 512), (600, 300)])
    ds = FolderPatchDataset(str(tmp_path), noise_levels=[15, 25, 50], use_rgb=True)
    idx = np.random.RandomState(0).permutation(len(ds))[:10]
    clean_b, sigma_b = ds.gather_batch(idx)
    for row, i in enumerate(idx):
        clean_i, sigma_i = ds[int(i)]
        np.testing.assert_array_equal(clean_b[row], clean_i)
        assert sigma_b[row] == np.float32(sigma_i)
    assert clean_b.dtype == np.uint8 and sigma_b.dtype == np.float32


def test_loader_batches_identical_with_and_without_gather(tmp_path):
    _write_pngs(tmp_path, [(512, 512)])
    ds = FolderPatchDataset(str(tmp_path), noise_levels=[25], use_rgb=True)

    class NoGather:
        """Same dataset with the batched path hidden."""

        def __init__(self, base):
            self._base = base
            self.channels = base.channels

        def __len__(self):
            return len(self._base)

        def __getitem__(self, i):
            return self._base[i]

    kw = dict(batch_size=2, shuffle=True, seed=4, num_workers=2)
    fast = [b for b in PatchLoader(ds, **kw)]
    slow = [b for b in PatchLoader(NoGather(ds), **kw)]
    assert len(fast) == len(slow) > 0
    for (c1, s1), (c2, s2) in zip(fast, slow):
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_subset_exposes_gather_only_when_base_has_it(tmp_path):
    from vub_image_denoising_tpu.data.loader import Subset

    _write_pngs(tmp_path, [(512, 256)])
    ds = FolderPatchDataset(str(tmp_path), noise_levels=[15, 25], use_rgb=True)
    sub = Subset(ds, [3, 1, 0])
    clean_b, sigma_b = sub.gather_batch([0, 2])
    np.testing.assert_array_equal(clean_b[0], ds[3][0])
    np.testing.assert_array_equal(clean_b[1], ds[0][0])
    assert sigma_b[0] == np.float32(ds[3][1])

    class Plain:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return np.zeros((8, 8, 3), np.uint8), 25.0

    assert not hasattr(Subset(Plain(), [0, 1]), "gather_batch")
