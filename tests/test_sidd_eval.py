"""SIDD .mat evaluation + Kaggle submission tests on synthetic .mat files."""

import numpy as np
import pandas as pd
import pytest
import scipy.io

import jax.numpy as jnp

from vub_image_denoising_tpu.eval.sidd import (
    SIDDMatBlocks,
    array_to_base64string,
    base64string_to_array,
    evaluate_sidd,
    make_kaggle_submission,
)


@pytest.fixture
def mat_files(tmp_path):
    rng = np.random.RandomState(0)
    gt = rng.randint(0, 256, (2, 4, 32, 32, 3), np.uint8)
    noisy = np.clip(gt.astype(np.float32) + rng.normal(scale=10, size=gt.shape), 0, 255).astype(np.uint8)
    noisy_path = str(tmp_path / "noisy.mat")
    gt_path = str(tmp_path / "gt.mat")
    scipy.io.savemat(noisy_path, {"ValidationNoisyBlocksSrgb": noisy})
    scipy.io.savemat(gt_path, {"ValidationGtBlocksSrgb": gt})
    return noisy_path, gt_path, noisy, gt


def test_mat_blocks_indexing(mat_files):
    noisy_path, gt_path, noisy, gt = mat_files
    blocks = SIDDMatBlocks(noisy_path, gt_path)
    assert len(blocks) == 8
    n0, g0 = blocks[5]  # img 1, patch 1
    np.testing.assert_array_equal(n0, noisy[1, 1])
    np.testing.assert_array_equal(g0, gt[1, 1])


def test_evaluate_sidd_identity_sampler(mat_files, tmp_path):
    noisy_path, gt_path, _, _ = mat_files
    blocks = SIDDMatBlocks(noisy_path, gt_path)
    csv = str(tmp_path / "bench.csv")
    res = evaluate_sidd(lambda x: x, blocks, evaluation_percentage=1.0,
                        batch_size=4, csv_path=csv)
    assert res["n_blocks"] == 8
    # identity sampler -> PSNR of noisy vs gt at sigma=10 on [-1,1] range-2 scale:
    # mse ~ (2*10/255)^2 -> psnr ~ 10log10(4/0.00615) ~ 28 dB
    assert 24 < res["avg_psnr"] < 32
    assert 0 < res["avg_ssim"] <= 1
    df = pd.read_csv(csv)
    assert float(df["PSNR"][0]) == pytest.approx(res["avg_psnr"])


def test_base64_roundtrip():
    x = np.random.RandomState(0).randint(0, 256, (8, 8, 3), np.uint8)
    s = array_to_base64string(x)
    y = base64string_to_array(s, np.uint8, (8, 8, 3))
    np.testing.assert_array_equal(x, y)


def test_kaggle_submission(mat_files, tmp_path):
    noisy_path, _, noisy, _ = mat_files
    bench_path = str(tmp_path / "benchmark.mat")
    scipy.io.savemat(bench_path, {"BenchmarkNoisyBlocksSrgb": noisy})
    out_csv = str(tmp_path / "SubmitSrgb.csv")
    make_kaggle_submission(lambda x: x, bench_path, out_csv, batch_size=3)
    df = pd.read_csv(out_csv)
    assert list(df.columns) == ["ID", "BLOCK"]
    assert len(df) == 8
    # identity sampler -> decoded block equals the uint8 input (normalize/denorm
    # roundtrip is exact up to the reference's clip(x*255).astype(uint8) truncation)
    dec = base64string_to_array(df["BLOCK"][0], np.uint8, (32, 32, 3))
    assert np.abs(dec.astype(int) - noisy[0, 0].astype(int)).max() <= 1
