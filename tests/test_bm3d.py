"""Native BM3D baseline (ops/bm3d.py): denoising gain, API compat, eval wiring."""

import numpy as np
import pytest

from vub_image_denoising_tpu.ops.bm3d import BM3DStages, bm3d


def _piecewise_image(h=80, w=80):
    yy, xx = np.mgrid[0:h, 0:w]
    img = 0.3 + 0.4 * xx / w
    img[(yy - 34) ** 2 + (xx - 26) ** 2 < 230] = 0.85
    img[(yy // 10) % 2 == 0] += 0.08
    return np.clip(img, 0, 1).astype(np.float32)


def _psnr(a, b):
    return 10 * np.log10(1.0 / np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_bm3d_denoises_sigma30():
    """At the reference's operating point (sigma_psd=30/255,
    evaluate_model.py:194) both stages must show a large PSNR gain on a
    piecewise-smooth image — published BM3D behavior at this sigma."""
    img = _piecewise_image()
    sigma = 30 / 255
    noisy = np.clip(
        img + np.random.RandomState(0).normal(scale=sigma, size=img.shape), 0, 1
    ).astype(np.float32)
    basic = bm3d(noisy, sigma, stage_arg=BM3DStages.HARD_THRESHOLDING)
    final = bm3d(noisy, sigma, stage_arg=BM3DStages.ALL_STAGES)
    p_noisy, p_basic, p_final = _psnr(img, noisy), _psnr(img, basic), _psnr(img, final)
    assert p_basic > p_noisy + 4.0, (p_noisy, p_basic)
    assert p_final > p_noisy + 4.0, (p_noisy, p_final)
    # the Wiener stage refines (or at worst ~matches) the basic estimate
    assert p_final > p_basic - 0.3, (p_basic, p_final)
    assert basic.shape == img.shape and final.shape == img.shape
    assert basic.dtype == np.float32


def test_bm3d_rejects_bad_inputs():
    with pytest.raises(ValueError):
        bm3d(np.zeros((32, 32, 3), np.float32), 0.1)  # RGB: reference grayscales first
    with pytest.raises(ValueError):
        bm3d(np.zeros((8, 8), np.float32), 0.1)  # too small for 8x8 matching


def test_bm3d_pip_compatible_surface():
    """eval/compare.py calls bm3d.bm3d(img, sigma_psd=..., stage_arg=
    bm3d.BM3DStages.ALL_STAGES) — the module must satisfy that call shape."""
    from vub_image_denoising_tpu.ops import bm3d as mod

    img = _piecewise_image(32, 32)
    out = mod.bm3d(img, sigma_psd=30 / 255, stage_arg=mod.BM3DStages.ALL_STAGES)
    assert out.shape == img.shape and np.isfinite(out).all()


def test_bm3d_near_clean_image_is_near_identity():
    img = _piecewise_image(48, 48)
    out = bm3d(img, 2 / 255)
    assert _psnr(img, out) > 30.0
