"""Search engine + comparative eval/plots smoke tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.search.optuna_compat import TrialPruned, create_study
from vub_image_denoising_tpu.eval.perceptual import make_dists, make_lpips


def test_fallback_study_optimizes():
    study = create_study(direction="minimize", seed=42, prefer_optuna=False)

    def objective(trial):
        x = trial.suggest_float("x", -10, 10)
        c = trial.suggest_categorical("c", ["a", "b"])
        return x**2 + (0 if c == "a" else 1)

    study.optimize(objective, n_trials=30)
    assert study.best_value < 5.0
    assert "x" in study.best_params


def test_fallback_study_pruning():
    study = create_study(direction="minimize", seed=0, prefer_optuna=False)

    def objective(trial):
        base = trial.suggest_float("base", 0, 1)
        for step in range(3):
            trial.report(base + step, step)
            if trial.should_prune():
                raise TrialPruned()
        return base

    study.optimize(objective, n_trials=10)
    states = {t.state for t in study.trials}
    assert "COMPLETE" in states
    # with 10 trials and median pruning some should get pruned
    assert any(t.state == "PRUNED" for t in study.trials)


def test_fallback_study_catch_continues_after_failed_trial():
    """optuna-parity catch=: a raising objective fails ONE trial, not the
    study (round-4 postmortem: a transient tunnel error aborted the 25-trial
    hardware study at trial 4)."""
    study = create_study(direction="minimize", seed=3, prefer_optuna=False)
    calls = []

    def objective(trial):
        x = trial.suggest_float("x", -1, 1)
        calls.append(trial.number)
        if trial.number == 1:
            raise RuntimeError("simulated device blip")
        return x**2

    seen = []
    study.optimize(objective, n_trials=5, catch=(RuntimeError,),
                   callbacks=[lambda s, t: seen.append((t.number, t.state))])
    assert calls == [0, 1, 2, 3, 4]  # the failure did not stop the loop
    states = [t.state for t in study.trials]
    assert states.count("FAIL") == 1 and states.count("COMPLETE") == 4
    assert seen[1] == (1, "FAIL")  # callbacks still fire for failed trials
    assert study.best_trial.value >= 0  # best ignores the failed trial
    # an uncaught type still propagates (catch is a whitelist)
    import pytest

    with pytest.raises(ValueError):
        study.optimize(lambda t: (_ for _ in ()).throw(ValueError("boom")),
                       n_trials=1, catch=(RuntimeError,))


def test_fallback_tpe_beats_random_on_quadratic():
    """After the startup phase, the TPE sampler must concentrate near the optimum:
    the best-of-50 TPE result should beat a pure-random best-of-50 on average."""
    import math
    import random as pyrandom

    def run_tpe(seed):
        study = create_study(direction="minimize", seed=seed, prefer_optuna=False)
        study.optimize(lambda t: (t.suggest_float("x", -10, 10) - 3.0) ** 2, n_trials=50)
        return study.best_value

    def run_random(seed):
        rng = pyrandom.Random(seed)
        return min((rng.uniform(-10, 10) - 3.0) ** 2 for _ in range(50))

    tpe = np.mean([run_tpe(s) for s in range(5)])
    rnd = np.mean([run_random(s) for s in range(5)])
    assert tpe < rnd, f"TPE mean best {tpe} should beat random {rnd}"
    assert tpe < 0.05  # concentrates near x=3


def test_fallback_tpe_log_and_categorical():
    """TPE on a log-scale float + categorical converges to the good region."""
    study = create_study(direction="minimize", seed=7, prefer_optuna=False)

    def objective(trial):
        lr = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
        opt = trial.suggest_categorical("opt", ["adam", "adamw", "sgd"])
        return abs(np.log10(lr) + 3.0) + (0.0 if opt == "adamw" else 0.5)

    study.optimize(objective, n_trials=80)
    assert study.best_value < 0.4
    assert study.best_params["opt"] == "adamw"
    # late trials should be concentrated (TPE working), not uniform
    late = [t.params["lr"] for t in study.trials[40:] if t.state == "COMPLETE"]
    assert np.median(np.abs(np.log10(late) + 3.0)) < 1.0


def test_suggest_int_step_matches_reference_space():
    study = create_study(direction="minimize", seed=1, prefer_optuna=False)
    seen = set()

    def objective(trial):
        bf = trial.suggest_int("base_filters", 16, 64, step=16)
        ts = trial.suggest_int("timesteps", 10, 20, step=5)
        seen.add((bf, ts))
        assert bf in (16, 32, 48, 64) and ts in (10, 15, 20)
        return 0.0

    study.optimize(objective, n_trials=40)
    assert len(seen) > 4


def test_suggest_loguniform_range():
    study = create_study(direction="minimize", seed=2, prefer_optuna=False)
    vals = []

    def objective(trial):
        lr = trial.suggest_loguniform("lr", 1e-5, 1e-3)
        vals.append(lr)
        return 0.0

    study.optimize(objective, n_trials=50)
    assert min(vals) >= 1e-5 and max(vals) <= 1e-3
    # log-uniform: median should be near geometric mean 1e-4
    assert 2e-5 < float(np.median(vals)) < 5e-4


def test_lpips_identity_zero():
    fn, _ = make_lpips()
    x = jnp.array(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    d = np.asarray(fn(x, x))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)
    y = jnp.clip(x + 0.3, -1, 1)
    assert float(fn(x, y).mean()) > 0


def test_dists_identity_zero():
    fn, _ = make_dists()
    x = jnp.array(np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    d = float(fn(x, x)[0])
    assert abs(d) < 1e-4
    y = jnp.clip(x + 0.5, -1, 1)
    assert float(fn(x, y)[0]) > d


def test_plots_smoke(tmp_path):
    from vub_image_denoising_tpu.eval import plots

    rng = np.random.RandomState(0)
    n = 24
    imgs = [rng.rand(32, 32, 3).astype(np.float32) for _ in range(n)]
    metrics = {
        "epoch": [40] * (n // 2) + [43] * (n // 2),
        "noise_level": list(np.tile([15, 30, 50], n // 3)),
        "gt_image": imgs,
        "degraded_image": imgs,
        "predicted_unet_image": imgs,
        "predicted_diffusion_image": imgs,
    }
    for k in ["psnr", "ssim", "lpips", "dists"]:
        for v in ["degraded", "diffusion", "unet", "bm3d"]:
            metrics[f"{k}_{v}"] = list(rng.rand(n))

    d = str(tmp_path)
    plots.save_metrics(metrics, 43, use_bm3d=True, save_dir=d)
    plots.save_dists(metrics, 43, save_dir=d)
    plots.generate_comparison_plot(metrics, [40, 43], save_dir=d, use_bm3d=True)
    plots.save_frequency_domain_analysis(metrics, 43, save_dir=d)
    plots.save_frequency_domain_analysis_multiple_epochs(metrics, [40, 43], save_dir=d)
    plots.plot_psd_comparison(metrics, 43, save_dir=d)
    plots.save_inference_time_plot({"unet": [0.1], "diffusion": [1.0]}, save_dir=d)
    plots.save_heatmaps(imgs[0], imgs[1], save_dir=d)
    plots.save_example_images({15: (imgs[0], imgs[1], imgs[2], imgs[3])}, save_dir=d,
                              noise_levels_to_plot=(15,))
    plots.save_histograms_of_differences(
        {(43, 15): (imgs[0], imgs[1], imgs[2], imgs[3])}, 43, save_dir=d)
    plots.save_error_map(imgs[0], imgs[1], save_dir=d)
    expected = [
        "metrics.png", "dists.png", "comparison_plot_with_zones_and_arrows.png",
        "high_frequency_domain_analysis.png",
        "high_frequency_domain_analysis_multiple_epochs.png",
        "inference_time_comparison.png", "heatmaps.png",
        "example_images_comparison.png", "histograms_of_differences.png",
        "error_map.png",
    ]
    for name in expected:
        assert os.path.exists(os.path.join(d, name)), name
    assert any(f.startswith("psd_comparison_noise_level_") for f in os.listdir(d))


def test_compare_runner_end_to_end(tmp_path):
    """evaluate_model_and_plot on tiny checkpoints + synthetic loader."""
    from vub_image_denoising_tpu.eval.compare import evaluate_model_and_plot
    from vub_image_denoising_tpu.models import RDUNet, RDUNetT
    from vub_image_denoising_tpu.utils import checkpoint as ckpt_io

    # write tiny checkpoints in reference layouts
    unet = RDUNet(channels=3, base_filters=4)
    up = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    unet_path = str(tmp_path / "rdunet.pth")
    ckpt_io.save_pth(unet_path, up)

    unet_t = RDUNetT(base_filters=4)
    dp = unet_t.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    diff_path = str(tmp_path / "diff_epoch_1.pth")
    ckpt_io.save_pth(diff_path, dp, epoch=1, prefix="unet.")

    rng = np.random.RandomState(0)
    batches = []
    for sigma in (15.0, 30.0):
        gt = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
        noisy = np.clip(gt + rng.randn(2, 32, 32, 3).astype(np.float32) * sigma / 127.5, -1, 1)
        batches.append((jnp.asarray(noisy), jnp.asarray(gt), jnp.full((2,), sigma)))

    save_dir = str(tmp_path / "results")
    metrics, times = evaluate_model_and_plot(
        epochs=[1], diffusion_model_paths=[diff_path], unet_model_path=unet_path,
        val_loader=batches, include_noise_level=True, save_dir=save_dir,
        timesteps=2, unet_base_filters=4, diffusion_base_filters=4,
    )
    assert len(metrics["psnr_diffusion"]) == 4  # 2 batches x 2 images x 1 epoch
    assert all(np.isfinite(metrics["psnr_diffusion"]))
    assert os.path.exists(os.path.join(save_dir, "metrics.png"))
    assert len(times["diffusion"]) == 2 and len(times["unet"]) == 2


def test_compare_runner_bm3d_native_path(tmp_path):
    """use_bm3d=True must produce finite BM3D metrics via the NATIVE ops/bm3d
    implementation (the pip package is absent in this environment) — the
    reference's BM3D curves (evaluate_model.py:164-218) are now runnable."""
    from vub_image_denoising_tpu.eval.compare import evaluate_model_and_plot
    from vub_image_denoising_tpu.models import RDUNetT
    from vub_image_denoising_tpu.utils import checkpoint as ckpt_io

    unet_t = RDUNetT(base_filters=4)
    dp = unet_t.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    diff_path = str(tmp_path / "diff_epoch_1.pth")
    ckpt_io.save_pth(diff_path, dp, epoch=1, prefix="unet.")

    rng = np.random.RandomState(0)
    gt = rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    noisy = np.clip(gt + rng.randn(*gt.shape).astype(np.float32) * 30 / 127.5, -1, 1)
    batches = [(jnp.asarray(noisy), jnp.asarray(gt), jnp.full((1,), 30.0))]

    metrics, _ = evaluate_model_and_plot(
        epochs=[1], diffusion_model_paths=[diff_path],
        unet_model_path=str(tmp_path / "missing.pth"),  # UNet skipped
        val_loader=batches, include_noise_level=True,
        save_dir=str(tmp_path / "results"), timesteps=2,
        diffusion_base_filters=4, use_bm3d=True,
    )
    assert len(metrics["psnr_bm3d"]) == 1
    assert np.isfinite(metrics["psnr_bm3d"][0]), metrics["psnr_bm3d"]
    assert np.isfinite(metrics["ssim_bm3d"][0])
