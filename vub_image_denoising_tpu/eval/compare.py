"""Comparative evaluation suite — port of
evaluate_Unet_diffusion/evaluate_model.py:24-327 (``evaluate_model_and_plot``).

Evaluates a supervised RDUNet checkpoint and one-or-more diffusion checkpoints (by
epoch) over a validation loader across noise levels, computing per-image PSNR, SSIM,
LPIPS and DISTS plus wall-clock inference times, aggregated |gt-pred| difference maps,
and example images, then emits the full figure suite (eval/plots.py).

Reference conventions replicated exactly (including quirks):
- PSNR/SSIM are computed on the raw [-1,1] loader tensors with data_range=1.0
  (evaluate_model.py:50-51) — i.e. ~6 dB below the standard [0,1] convention;
- LPIPS/DISTS inputs go through ``normalize_to_neg1_1`` (2x-1) even though the tensors
  are already [-1,1] (:27-28,60-61);
- grayscale LPIPS inputs are channel-repeated to 3 (:57-58);
- BM3D runs on grayscale-averaged denormalized images with sigma_psd=30/255 and
  per-sample exception swallowing (:164-218); requires the optional ``bm3d`` package.
Set ``strict_reference_conventions=False`` for corrected metrics (denormalized [0,1],
data_range=1).
"""

import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.interpolation import InterpolationDiffusion
from ..models.rdunet import RDUNet, RDUNetT
from ..utils import checkpoint as ckpt_io
from .metrics import psnr as psnr_metric
from .metrics import psnr_per_image, ssim_ref, ssim_ref_per_image
from .perceptual import make_dists, make_lpips
from . import plots


def make_batch_metrics(lpips_fn, dists_fn, strict=True):
    """One jitted call computing per-image PSNR/SSIM/LPIPS/DISTS vectors for a batch.

    Identical values to the reference's per-image loop (evaluate_model.py:46-71,
    including its conventions — see module docstring) but ~batch_size fewer device
    round-trips per variant."""

    @jax.jit
    def f(gt, proc):
        if strict:
            a, b = gt, proc
        else:
            a, b = denormalize(gt), denormalize(proc)
        p = psnr_per_image(a, b, data_range=1.0)
        s = ssim_ref_per_image(a, b, data_range=1.0)
        ga, gb = (2 * gt - 1, 2 * proc - 1) if strict else (gt, proc)
        if ga.shape[-1] == 1:
            ga = jnp.repeat(ga, 3, axis=-1)
            gb = jnp.repeat(gb, 3, axis=-1)
        l = lpips_fn(ga, gb) if lpips_fn else jnp.full(p.shape, jnp.nan)
        d = dists_fn(ga, gb) if dists_fn else jnp.full(p.shape, jnp.nan)
        return p, s, l, d

    return f


def denormalize(x, mean=0.5, std=0.5):
    return x * std + mean


def compute_metrics(gt, processed, lpips_fn, dists_fn, strict=True):
    """Per-image metrics; gt/processed are (H,W,C) arrays in [-1,1]."""
    gt = np.asarray(gt, np.float32)
    processed = np.asarray(processed, np.float32)
    if strict:
        a, b = gt, processed  # reference quirk: metrics on [-1,1] with range 1
    else:
        a, b = denormalize(gt), denormalize(processed)
    psnr_v = float(psnr_metric(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    ssim_v = float(ssim_ref(jnp.asarray(a), jnp.asarray(b), data_range=1.0))

    ga, gb = (2 * gt - 1, 2 * processed - 1) if strict else (gt, processed)
    if ga.shape[-1] == 1:
        ga = np.repeat(ga, 3, axis=-1)
        gb = np.repeat(gb, 3, axis=-1)
    lpips_v = float(lpips_fn(jnp.asarray(ga)[None], jnp.asarray(gb)[None])[0]) if lpips_fn else float("nan")
    dists_v = float(dists_fn(jnp.asarray(ga)[None], jnp.asarray(gb)[None])[0]) if dists_fn else float("nan")
    return psnr_v, ssim_v, lpips_v, dists_v


def _load_into(model_init_args, path, prefix="", allow_pickle=False):
    """Tolerant .pth loader (dict-wrapped or bare; evaluate_model.py:94-110)."""
    model, init_args = model_init_args
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), *init_args)
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    loaded, _ = ckpt_io.load_pth(path, params, prefix=prefix, allow_pickle=allow_pickle)
    return loaded


def evaluate_model_and_plot(
    epochs: Sequence[int],
    diffusion_model_paths: Sequence[str],
    unet_model_path: str,
    val_loader,
    include_noise_level: bool = False,
    use_bm3d: bool = False,
    save_dir: str = "results",
    timesteps: int = 20,
    unet_base_filters: int = 128,
    diffusion_base_filters: int = 32,
    strict_reference_conventions: bool = True,
    lpips_weights: Optional[str] = None,
    max_batches: Optional[int] = None,
    trusted_checkpoints: bool = False,
):
    """``trusted_checkpoints=True`` allows the full-unpickling torch.load
    fallback for checkpoints that fail the safe weights-only path (e.g. .pth
    files written by this framework before the safe optax-leaves format) —
    only pass it for files you wrote yourself."""
    os.makedirs(save_dir, exist_ok=True)

    # exact-f32 convs for the parity-critical metric/eval path (see
    # vub_image_denoising_tpu.enable_strict_precision)
    from .. import enable_strict_precision

    enable_strict_precision()

    lpips_fn, _ = make_lpips(weights_path=lpips_weights)
    dists_fn, _ = make_dists()
    batch_metrics = make_batch_metrics(lpips_fn, dists_fn, strict_reference_conventions)

    keys = ["psnr", "ssim", "lpips", "dists"]
    variants = ["degraded", "diffusion", "unet", "bm3d"]
    metrics = {f"{k}_{v}": [] for k in keys for v in variants}
    metrics.update({"epoch": [], "noise_level": [], "gt_image": [],
                    "degraded_image": [], "predicted_unet_image": [],
                    "predicted_diffusion_image": []})
    example_images = {}
    agg_diff_unet, agg_diff_diffusion, agg_count = None, None, 0
    inference_times = {"unet": [], "diffusion": []}

    evaluate_unet = os.path.exists(unet_model_path)
    if evaluate_unet:
        unet_model = RDUNet(channels=3, base_filters=unet_base_filters)
        dummy = jnp.zeros((1, 64, 64, 3))
        unet_params = _load_into((unet_model, (dummy,)), unet_model_path,
                                 allow_pickle=trusted_checkpoints)
        unet_fwd = jax.jit(unet_model.apply)
    else:
        print(f"UNet model path '{unet_model_path}' does not exist. Skipping UNet evaluation.")

    diffusion = InterpolationDiffusion(timesteps=timesteps)
    unet_t = RDUNetT(base_filters=diffusion_base_filters)
    sampler = jax.jit(lambda p, x: diffusion.improved_sampling(unet_t.apply, p, x))

    if use_bm3d:
        try:
            import bm3d  # noqa: F401
        except ImportError:
            # no egress -> pip bm3d absent; the native numpy two-stage
            # implementation (ops/bm3d.py) is call-compatible and keeps the
            # reference's BM3D curves producible in this environment
            from ..ops import bm3d  # noqa: F401

            print("bm3d package not available; using the native BM3D implementation.")

    for epoch, dpath in zip(epochs, diffusion_model_paths):
        dummy = jnp.zeros((1, 64, 64, 3))
        diff_params = _load_into((unet_t, (dummy, jnp.zeros((1,)))), dpath,
                                 prefix="unet.", allow_pickle=trusted_checkpoints)

        for batch_idx, data in enumerate(val_loader):
            if max_batches is not None and batch_idx >= max_batches:
                break
            if include_noise_level:
                degraded, gt, noise_levels = data
            else:
                degraded, gt = data
                noise_levels = None

            # completion forced via device_get, not block_until_ready: on the axon
            # runtime block_until_ready can return before execution finishes
            # (CLAUDE.md); this is our cuda.synchronize (evaluate_model.py:126-143)
            t0 = time.perf_counter()
            pred_diffusion = sampler(diff_params, degraded)
            jax.device_get(pred_diffusion[0, 0, 0, 0])
            inference_times["diffusion"].append(time.perf_counter() - t0)

            if evaluate_unet:
                t0 = time.perf_counter()
                pred_unet = unet_fwd(unet_params, degraded)
                jax.device_get(pred_unet[0, 0, 0, 0])
                inference_times["unet"].append(time.perf_counter() - t0)
            else:
                pred_unet = pred_diffusion

            # batched metrics: one device call per variant instead of per image
            gt_dev = jnp.asarray(gt, jnp.float32)
            res_deg_b = [np.asarray(v) for v in batch_metrics(gt_dev, jnp.asarray(degraded, jnp.float32))]
            res_dif_b = [np.asarray(v) for v in batch_metrics(gt_dev, pred_diffusion.astype(jnp.float32))]
            res_un_b = (
                [np.asarray(v) for v in batch_metrics(gt_dev, pred_unet.astype(jnp.float32))]
                if evaluate_unet else None
            )

            degraded_np = np.asarray(degraded)
            gt_np = np.asarray(gt)
            pd_np = np.asarray(pred_diffusion)
            pu_np = np.asarray(pred_unet)

            for j in range(degraded_np.shape[0]):
                res_deg = tuple(float(v[j]) for v in res_deg_b)
                res_dif = tuple(float(v[j]) for v in res_dif_b)
                res_un = tuple(float(v[j]) for v in res_un_b) if evaluate_unet else (np.nan,) * 4

                if use_bm3d:
                    try:
                        # 'bm3d' was resolved once at function scope above
                        deg01 = denormalize(degraded_np[j]).mean(axis=-1)
                        gt01 = denormalize(gt_np[j]).mean(axis=-1)
                        den = bm3d.bm3d(deg01, sigma_psd=30 / 255,
                                        stage_arg=bm3d.BM3DStages.ALL_STAGES)
                        res_bm = (
                            float(psnr_metric(jnp.asarray(gt01)[..., None],
                                              jnp.asarray(den)[..., None], 1.0)),
                            float(ssim_ref(jnp.asarray(gt01)[..., None],
                                           jnp.asarray(den)[..., None], 1.0)),
                            np.nan, np.nan,
                        )
                    except Exception as e:  # per-sample swallow (evaluate_model.py:207-218)
                        print(f"BM3D failed: {e}")
                        res_bm = (np.nan,) * 4
                else:
                    res_bm = (np.nan,) * 4

                for ki, k in enumerate(keys):
                    metrics[f"{k}_degraded"].append(res_deg[ki])
                    metrics[f"{k}_diffusion"].append(res_dif[ki])
                    metrics[f"{k}_unet"].append(res_un[ki])
                    metrics[f"{k}_bm3d"].append(res_bm[ki])

                nl = float(noise_levels[j]) if noise_levels is not None else 0.0
                metrics["epoch"].append(epoch)
                metrics["noise_level"].append(nl)
                gt01 = denormalize(gt_np[j])
                deg01 = denormalize(degraded_np[j])
                pd01 = denormalize(pd_np[j])
                pu01 = denormalize(pu_np[j])
                metrics["gt_image"].append(gt01)
                metrics["degraded_image"].append(deg01)
                metrics["predicted_unet_image"].append(pu01)
                metrics["predicted_diffusion_image"].append(pd01)

                diff_u = np.abs(gt01 - pu01)
                diff_d = np.abs(gt01 - pd01)
                if agg_diff_unet is None:
                    agg_diff_unet, agg_diff_diffusion = diff_u, diff_d
                else:
                    agg_diff_unet = agg_diff_unet + diff_u
                    agg_diff_diffusion = agg_diff_diffusion + diff_d
                agg_count += 1

                if nl in (10, 15, 30, 50):
                    example_images.setdefault(
                        int(nl), (gt01, deg01, pu01, pd01))
                    example_images.setdefault(
                        (epoch, int(nl)), (gt01, deg01, pu01, pd01))

    last_epoch = epochs[-1]
    if agg_count:
        agg_diff_unet = agg_diff_unet / agg_count
        agg_diff_diffusion = agg_diff_diffusion / agg_count
        plots.save_heatmaps(agg_diff_unet, agg_diff_diffusion, save_dir)
    plots.save_example_images({k: v for k, v in example_images.items()
                               if isinstance(k, int)}, save_dir)
    plots.save_histograms_of_differences(
        {k: v for k, v in example_images.items() if isinstance(k, tuple)},
        last_epoch, save_dir)
    plots.save_frequency_domain_analysis(metrics, last_epoch, save_dir)
    plots.save_frequency_domain_analysis_multiple_epochs(metrics, list(epochs), save_dir)
    plots.plot_psd_comparison(metrics, last_epoch, save_dir)
    plots.save_dists(metrics, last_epoch, save_dir)
    plots.save_inference_time_plot(inference_times, save_dir)
    if evaluate_unet:
        plots.generate_comparison_plot(metrics, list(epochs), save_dir, use_bm3d=use_bm3d)
    plots.save_metrics(metrics, last_epoch, use_bm3d, save_dir)

    return metrics, inference_times
