"""First hardware run of the C16 GAN hyperparameter search (VERDICT r3 #3).

Drives ``search/gan_search.py::objective_gan`` (the bytecode-only
``train_denoising_gan_hyperparameters`` port: attention-U-Net GAN trainer +
per-epoch trial.report / median pruning) end-to-end on the real chip over the
same synthetic grayscale pair protocol as scripts/train_tpu_gan_accuracy.py.
The search space (lambda_pixel/perceptual/edge + lr) keeps the architecture
fixed, so all trials share one compiled executable — trials are cheap after
trial 0.

Usage (TPU):  python scripts/run_gan_search_tpu.py --trials 8 --epochs 5
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from train_tpu_accuracy import synth_train_val  # noqa: E402
from train_tpu_gan_accuracy import PairLoader  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument("--csv", default="runs/gan_trial_results_tpu.csv")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vub_image_denoising_tpu.data.device import add_gaussian_noise_u8
    from vub_image_denoising_tpu.search.gan_search import run_gan_search
    from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    train_rgb, val_rgb = synth_train_val(args.n_train, args.n_val, args.size)
    train_gt = train_rgb.mean(axis=-1, keepdims=True).astype(np.uint8)
    val_gt = val_rgb.mean(axis=-1, keepdims=True).astype(np.uint8)

    def degrade(gt_u8, key):
        sig = jnp.full((len(gt_u8),), args.sigma, jnp.float32)
        return np.asarray(jax.device_get(
            add_gaussian_noise_u8(key, jnp.asarray(gt_u8), sig)
        ))

    train_loader = PairLoader(degrade(train_gt, jax.random.PRNGKey(7)),
                              train_gt, args.batch_size, seed=1)
    val_loader = PairLoader(degrade(val_gt, jax.random.PRNGKey(123)),
                            val_gt, args.batch_size, seed=2, shuffle=False)

    os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
    if os.path.exists(args.csv):
        os.remove(args.csv)
    t0 = time.time()
    study = run_gan_search(train_loader, val_loader, n_trials=args.trials,
                           num_epochs=args.epochs, csv_path=args.csv)
    pruned = sum(1 for t in study.trials if t.value is None)
    print(f"gan search wall: {time.time() - t0:.0f}s; trials {args.trials} "
          f"({pruned} pruned); best val_l1 {study.best_trial.value:.4f}; "
          f"best params {study.best_trial.params}; csv -> {args.csv}", flush=True)


if __name__ == "__main__":
    main()
