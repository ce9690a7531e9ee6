"""Run the full comparative evaluation suite end-to-end with trained checkpoints.

Drives eval/compare.py::evaluate_model_and_plot — the port of
evaluate_Unet_diffusion/evaluate_model.py:73-327 — exactly the way the reference
does (:313-327): a noise-level-cycling validation loader (sigma in
{10,20,30,40,50}, include_noise_level=True), a supervised RDUNet checkpoint, a
diffusion RDUNet_T checkpoint, and BM3D as the classical baseline (the native
ops/bm3d.py implementation; no pip package in this environment).  Produces the
full figure suite + metrics CSV in --save-dir.

The checkpoints come from scripts/train_tpu_accuracy.py runs (the reference
repo ships none, so these are the first real trained weights this comparison
has ever run on).

Usage (TPU, background — BM3D alone is ~30 s/image on this 1-core host):
    python scripts/run_comparative_suite.py \
        --unet-ckpt runs/accuracy_ckpt/rdunet_denoising.pth \
        --diffusion-ckpt runs/accuracy_ckpt_diffusion/diffusion_RDUNet_model_checkpointed_epoch_150.pth
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from train_tpu_accuracy import synth_images  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unet-ckpt", default="runs/accuracy_ckpt/rdunet_denoising.pth")
    ap.add_argument(
        "--diffusion-ckpt",
        default="runs/accuracy_ckpt_diffusion/diffusion_RDUNet_model_checkpointed_epoch_150.pth",
    )
    ap.add_argument("--epoch-label", type=int, default=150)
    ap.add_argument("--n-images", type=int, default=25)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=5)
    ap.add_argument("--base-filters", type=int, default=32)
    ap.add_argument(
        "--unet-base-filters", type=int, default=0,
        help="UNet width when it differs from --base-filters (e.g. the "
        "flagship 128 ckpt next to the base-32 diffusion ckpt); 0 = same",
    )
    ap.add_argument("--timesteps", type=int, default=20)
    ap.add_argument("--no-bm3d", action="store_true")
    ap.add_argument("--save-dir", default="runs/comparative")
    ap.add_argument(
        "--corrected", action="store_true",
        help="use corrected metric conventions instead of the reference's "
        "strict ones (see eval/compare.py docstring)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from vub_image_denoising_tpu.data.device import add_gaussian_noise_u8
    from vub_image_denoising_tpu.eval.compare import evaluate_model_and_plot

    noise_levels = [10, 20, 30, 40, 50]
    rng = np.random.RandomState(7)
    print(f"generating {args.n_images} synthetic {args.size}^2 val images...",
          flush=True)
    clean = synth_images(args.n_images, args.size, rng)
    sigmas = np.asarray(
        [noise_levels[i % len(noise_levels)] for i in range(args.n_images)],
        np.float32,
    )
    noisy = np.asarray(jax.device_get(add_gaussian_noise_u8(
        jax.random.PRNGKey(99), jnp.asarray(clean), jnp.asarray(sigmas)
    )))

    def norm(u8):
        return (u8.astype(np.float32) / 255.0 - 0.5) / 0.5

    class ValLoader:
        """(degraded, gt, noise_levels) batches in [-1,1] — the shape
        data_loader.py::load_data(include_noise_level=True) yields."""

        def __iter__(self):
            for s in range(0, args.n_images, args.batch_size):
                e = min(s + args.batch_size, args.n_images)
                yield (
                    jnp.asarray(norm(noisy[s:e])),
                    jnp.asarray(norm(clean[s:e])),
                    jnp.asarray(sigmas[s:e]),
                )

    t0 = time.time()
    metrics, times = evaluate_model_and_plot(
        epochs=[args.epoch_label],
        diffusion_model_paths=[args.diffusion_ckpt],
        unet_model_path=args.unet_ckpt,
        val_loader=ValLoader(),
        include_noise_level=True,
        use_bm3d=not args.no_bm3d,
        save_dir=args.save_dir,
        timesteps=args.timesteps,
        unet_base_filters=args.unet_base_filters or args.base_filters,
        diffusion_base_filters=args.base_filters,
        strict_reference_conventions=not args.corrected,
        # checkpoints written by our own train_tpu_accuracy.py runs
        trusted_checkpoints=True,
    )
    wall = time.time() - t0

    # summary: mean PSNR/SSIM per variant per sigma
    nl = np.asarray(metrics["noise_level"])
    summary = {"wall_seconds": round(wall, 1), "n_images": args.n_images,
               "convention": "corrected" if args.corrected else "strict_reference"}
    for variant in ("degraded", "unet", "diffusion", "bm3d"):
        for key in ("psnr", "ssim"):
            vals = np.asarray(metrics[f"{key}_{variant}"], np.float64)
            if not np.isfinite(vals).any():
                continue  # variant not run (e.g. --no-bm3d): omit rather than
                # emit the non-JSON NaN token into summary.json
            summary[f"{key}_{variant}_by_sigma"] = {
                str(int(lv)): (round(float(np.nanmean(vals[nl == lv])), 3)
                               if np.isfinite(vals[nl == lv]).any() else None)
                for lv in noise_levels
            }
    summary["inference_ms_mean"] = {
        k: round(1e3 * float(np.mean(v)), 1) for k, v in times.items() if v
    }
    out = os.path.join(args.save_dir, "summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    print(f"figures + CSV in {args.save_dir}", flush=True)


if __name__ == "__main__":
    main()
