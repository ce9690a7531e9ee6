"""Experimental/legacy models, presets plumbing, misc utils, SIDD CLI."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.models.experimental import (
    GaussianDiffusion,
    GeneratorWithDiffusion,
    SmallUNet,
    UNetS,
)


def test_gaussian_diffusion_schedule():
    gd = GaussianDiffusion(1e-4, 0.02, 100)
    betas = np.asarray(gd.betas)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    acp = np.asarray(gd.alpha_cumprod)
    assert np.all(np.diff(acp) < 0) and acp[0] == pytest.approx(1 - 1e-4)
    prev = np.asarray(gd.alpha_cumprod_prev)
    assert prev[0] == 1.0
    np.testing.assert_allclose(prev[1:], acp[:-1])
    pv = np.asarray(gd.posterior_variance)
    np.testing.assert_allclose(pv, betas * (1 - prev) / (1 - acp), rtol=1e-6)


def test_q_sample_and_predict_roundtrip():
    gd = GaussianDiffusion(num_timesteps=50)
    rng = np.random.RandomState(0)
    x0 = jnp.array(rng.randn(2, 8, 8, 3).astype(np.float32))
    noise = jnp.array(rng.randn(2, 8, 8, 3).astype(np.float32))
    t = jnp.array([10, 40])
    xt = gd.q_sample(x0, t, noise)
    x0_rec = gd.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_p_losses_zero_for_perfect_model():
    gd = GaussianDiffusion(num_timesteps=50)
    rng = np.random.RandomState(1)
    x0 = jnp.array(rng.randn(2, 8, 8, 3).astype(np.float32))
    noise = jnp.array(rng.randn(2, 8, 8, 3).astype(np.float32))
    t = jnp.array([5, 30])
    loss = gd.p_losses(lambda xn, tt: noise, x0, t, noise)
    assert float(loss) == 0.0


def test_small_unet_shapes():
    m = SmallUNet(64)
    x = jnp.zeros((1, 16, 16, 64))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 16, 16, 64)


def test_generator_with_diffusion_forward():
    g = GeneratorWithDiffusion(1, 1, num_timesteps=10)
    x = jnp.array(np.random.RandomState(0).randn(1, 16, 16, 1).astype(np.float32)) * 0.1
    v = g.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), train=False)
    y, _ = g.apply(v, x, jax.random.PRNGKey(2), train=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    assert float(jnp.abs(y).max()) <= 1.0


def test_diffusion_gan_hybrid_trains(tmp_path):
    """C17: GeneratorWithDiffusion runs real G/D optimizer steps against the RCA-GAN
    critic/losses (experimental_diffusion_gan.py:390-395) — per-batch DDPM timestep
    through q_sample, mutable batch_stats under grad, WGAN-GP intact."""
    import torch

    from vub_image_denoising_tpu.train.gan import RCAGANTrainer, weights_init_normal

    trainer = RCAGANTrainer(
        generator=GeneratorWithDiffusion(1, 1, num_timesteps=10),
        checkpoint_dir=str(tmp_path), disc_input_hw=16,
    )
    rng = np.random.RandomState(0)
    sample = jnp.array(rng.randn(2, 16, 16, 1).astype(np.float32)) * 0.1
    state = trainer.init(jax.random.PRNGKey(0), sample, steps_per_epoch=1)
    ki, kd = jax.random.split(jax.random.PRNGKey(1))
    state = state.replace(
        g_params=weights_init_normal(state.g_params, ki),
        d_params=weights_init_normal(state.d_params, kd),
    )
    # weights_init_normal semantics (experimental_diffusion_gan.py:405-411)
    k0 = state.g_params["feature_extraction.2"]["kernel"]
    assert 0.005 < float(jnp.std(k0)) < 0.05
    bn_scale = jax.tree_util.tree_leaves(
        {k: v for k, v in state.d_params["conv_layers.0"].items() if k == "bn"}
    )
    assert bn_scale  # critic BN present under default norm="bn"

    degraded = jnp.array(rng.randn(2, 16, 16, 1).astype(np.float32)) * 0.1
    gt = jnp.array(rng.randn(2, 16, 16, 1).astype(np.float32)) * 0.1
    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    losses = []
    for i in range(2):  # >= 2 full optimizer rounds
        state, d_loss = trainer._jit_d_step(state, jax.random.PRNGKey(10 + i), degraded, gt)
        state, g_loss, parts = trainer._jit_g_step(
            state, jax.random.PRNGKey(20 + i), degraded, gt, trainer.vgg_params
        )
        losses += [float(d_loss), float(g_loss)] + [float(v) for v in parts.values()]
    assert all(np.isfinite(v) for v in losses)
    assert not np.allclose(np.asarray(g0), np.asarray(jax.tree_util.tree_leaves(state.g_params)[0]))

    # stochastic eval forward (the hybrid's q_sample draw stays live in eval mode)
    out = trainer.generate(state, degraded, jax.random.PRNGKey(3))
    assert out.shape == degraded.shape

    # checkpoint round-trip under torch's safe weights-only default
    path = trainer.save_checkpoint(state, epoch=9)
    payload = torch.load(path, map_location="cpu", weights_only=True)
    assert {"generator_state_dict", "discriminator_state_dict"} <= set(payload)
    assert any(k.startswith("unet.") for k in payload["generator_state_dict"])

    # validation path (full multimodal objective) also runs with the hybrid
    vloss = trainer._jit_val_loss(state, jax.random.PRNGKey(4), degraded, gt, trainer.vgg_params)
    assert np.isfinite(float(vloss))


def test_unet_s_legacy():
    m = UNetS(remat=True)
    x = jnp.array(np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32))
    t = jnp.array([0.5, 1.0])
    v = m.init(jax.random.PRNGKey(0), x, t)
    y = m.apply(v, x, t)
    assert y.shape == (2, 16, 16, 3)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh head


def test_paired_folder_dataset(tmp_path):
    from PIL import Image

    from vub_image_denoising_tpu.data.datasets import PairedFolderDataset

    gt_dir = tmp_path / "gt"
    deg_dir = tmp_path / "deg"
    gt_dir.mkdir()
    deg_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            gt_dir / f"im{i}.png")
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            deg_dir / f"im{i}.png")
    ds = PairedFolderDataset(str(gt_dir), str(deg_dir), use_rgb=True)
    assert len(ds) == 3
    deg, gt = ds[0]
    assert deg.shape == (16, 16, 3) and gt.shape == (16, 16, 3)

    (deg_dir / "extra.png").unlink(missing_ok=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(deg_dir / "extra.png")
    with pytest.raises(ValueError):
        PairedFolderDataset(str(gt_dir), str(deg_dir))


def test_misc_utils(tmp_path, capsys):
    from vub_image_denoising_tpu.utils.misc import clear_runs, probe_devices, summarize_dataset

    runs = tmp_path / "runs"
    runs.mkdir()
    (runs / "x.txt").write_text("y")
    clear_runs(str(runs))
    assert not runs.exists()

    devices = probe_devices()
    assert len(devices) == 8  # virtual CPU mesh

    from PIL import Image

    folder = tmp_path / "imgs"
    folder.mkdir()
    Image.fromarray(np.zeros((512, 256, 3), np.uint8)).save(folder / "a.png")
    info = summarize_dataset(str(folder))
    assert info == {"images": 1, "patches": 2, "noise_levels": [15, 25, 50], "samples": 6}

    from vub_image_denoising_tpu.utils.misc import probe_mat

    import scipy.io

    mat = tmp_path / "blocks.mat"
    scipy.io.savemat(str(mat), {"ValidationNoisyBlocksSrgb": np.zeros((1, 1, 4, 4, 3), np.uint8)})
    keys = probe_mat(str(mat))
    assert "ValidationNoisyBlocksSrgb" in keys


def test_model_summary_and_latency():
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.utils.info import measure_inference_metrics, model_summary

    model = RDUNet(channels=3, base_filters=4)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    s = model_summary(model.apply, params, x)
    assert s["params"] > 0 and s["flops"] and s["flops"] > 0
    m = measure_inference_metrics(model.apply, params, x, num_iterations=2)
    assert m["avg_inference_sec"] > 0


def test_sidd_cli_validate(tmp_path):
    import scipy.io

    from vub_image_denoising_tpu.eval.sidd_cli import main
    from vub_image_denoising_tpu.models.rdunet import RDUNetT
    from vub_image_denoising_tpu.utils import checkpoint as ckpt_io

    unet = RDUNetT(base_filters=4)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    ck = str(tmp_path / "ck.pth")
    ckpt_io.save_pth(ck, params, epoch=1, prefix="unet.")

    rng = np.random.RandomState(0)
    gt = rng.randint(0, 256, (1, 4, 32, 32, 3), np.uint8)
    noisy = np.clip(gt + rng.normal(scale=10, size=gt.shape), 0, 255).astype(np.uint8)
    nmat = str(tmp_path / "n.mat")
    gmat = str(tmp_path / "g.mat")
    scipy.io.savemat(nmat, {"ValidationNoisyBlocksSrgb": noisy})
    scipy.io.savemat(gmat, {"ValidationGtBlocksSrgb": gt})

    res = main([
        "validate", "--checkpoint", ck, "--noisy-mat", nmat, "--gt-mat", gmat,
        "--base-filters", "4", "--timesteps", "2", "--evaluation-percentage", "1.0",
        "--batch-size", "2", "--csv", str(tmp_path / "out.csv"),
    ])
    assert np.isfinite(res["avg_psnr"])
    assert (tmp_path / "out.csv").exists()


def test_probe_device_exec_cpu_and_timeout():
    """A4 failure detection: the exec probe must report healthy on a working
    (CPU) backend and cleanly time out rather than hang on a dead one."""
    from vub_image_denoising_tpu.utils.health import probe_device_exec

    ok, dt, detail = probe_device_exec(timeout_s=120.0, platform="cpu")
    assert ok, detail
    # a sub-second timeout cannot fit interpreter start + jit: must come back
    # as a clean failure, never a hang
    ok2, dt2, detail2 = probe_device_exec(timeout_s=0.5, platform="cpu")
    assert not ok2 and dt2 < 30, (dt2, detail2)


def test_bench_exec_path_gate(monkeypatch, capsys):
    """bench.py must fail fast with a diagnostic JSON line — not hang — when
    the device exec path is dead (the round-5 futex death mode), and no-op on
    non-axon backends."""
    import json

    import bench

    # non-axon backend (tests run on cpu): gate is a no-op
    bench._exec_path_gate()

    # simulate axon + a dead probe: diagnostic line + non-zero exit
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "axon")
    import vub_image_denoising_tpu.utils.health as health

    monkeypatch.setattr(health, "probe_device_exec",
                        lambda timeout_s=240: (False, timeout_s, "timeout"))
    monkeypatch.setenv("BENCH_HEALTH_WAIT_S", "0")
    with pytest.raises(SystemExit) as exc:
        bench._exec_path_gate()
    assert exc.value.code == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["error"] == "device exec path dead"

    # healthy probe: gate returns
    monkeypatch.setattr(health, "probe_device_exec",
                        lambda timeout_s=240: (True, 5.0, "EXEC_OK 128.0"))
    bench._exec_path_gate()
