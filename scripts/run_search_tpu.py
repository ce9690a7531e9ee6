"""Drive the C13 hyperparameter search end-to-end on the real TPU.

The search engine (search/hyperparams.py over search/optuna_compat.py — TPE
sampler + median pruner, reference space hyperparams_search.py:32-70) is
CPU-test-covered; this script runs a small REAL study on the chip: N trials of
the diffusion trainer on synthetic fixed-noise pairs, per-epoch pruning, and
the merge-safe ``trial_results.csv`` artifact.

Usage (TPU):  python scripts/run_search_tpu.py --trials 4 --epochs 2

Reference-scale study (hyperparams_search.py:93-104 runs 50 trials x ~5 epochs;
VERDICT r3 #3 asks for >=25 trials at the 256^2-patch protocol):

    python scripts/run_search_tpu.py --trials 25 --epochs 5 --size 256 \
        --n-train 256 --n-val 16 --batch-size 16 --engine xla --bf16 \
        --csv runs/trial_results_tpu_ref_scale.csv
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from train_tpu_accuracy import synth_train_val  # noqa: E402
from train_tpu_gan_accuracy import PairLoader  # noqa: E402  (fixed uint8 pairs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument("--csv", default="runs/trial_results_tpu.csv")
    ap.add_argument("--engine", default="flax", choices=("flax", "xla", "pallas"),
                    help="run every trial's trainer on this engine (xla = the "
                         "measured hardware sweet spot; search space unchanged)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute for every trial (hardware sweet spot)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vub_image_denoising_tpu.data.device import add_gaussian_noise_u8
    from vub_image_denoising_tpu.search.hyperparams import run_search
    from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    train_gt, val_gt = synth_train_val(args.n_train, args.n_val, args.size)

    def degrade(gt_u8, key):
        sig = jnp.full((len(gt_u8),), args.sigma, jnp.float32)
        return np.asarray(jax.device_get(
            add_gaussian_noise_u8(key, jnp.asarray(gt_u8), sig)
        ))

    train_loader = PairLoader(degrade(train_gt, jax.random.PRNGKey(1)),
                              train_gt, args.batch_size, seed=1)
    val_loader = PairLoader(degrade(val_gt, jax.random.PRNGKey(2)),
                            val_gt, args.batch_size, seed=2, shuffle=False)

    os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
    if os.path.exists(args.csv):
        os.remove(args.csv)
    trainer_kwargs = {"engine": args.engine}
    if args.bf16:
        trainer_kwargs["compute_dtype"] = jnp.bfloat16
    t0 = time.time()
    # catch=(Exception,): a transient axon-tunnel error fails ONE trial (30 s
    # cool-down) instead of aborting the study — round-4's 25-trial study died
    # at trial 4 on "response body closed before all bytes were read".
    study = run_search(train_loader, val_loader, n_trials=args.trials,
                       num_epochs=args.epochs, csv_path=args.csv,
                       trainer_kwargs=trainer_kwargs,
                       catch=(Exception,), fail_wait_s=30.0)
    states = [str(getattr(t, "state", "")) for t in study.trials]
    failed = sum("FAIL" in s for s in states)
    done = sum(1 for t in study.trials if t.value is not None)
    pruned = len(study.trials) - done - failed
    try:
        best = study.best_trial
        best_txt = f"best -psnr {best.value:.3f}; best params {best.params}"
        best_params, best_value = best.params, best.value
    except ValueError:
        best_txt = "no completed trials"
        best_params, best_value = None, None
    print(f"search wall: {time.time() - t0:.0f}s; trials {len(study.trials)} "
          f"({done} completed, {pruned} pruned, {failed} failed); {best_txt}; "
          f"csv -> {args.csv}", flush=True)
    # completion sidecar: written ONLY when the whole study ran, so the
    # manifest's liveness marker can distinguish a finished study from a
    # killed one (a partial CSV looks identical otherwise — ADVICE r4)
    summary = {
        "trials": len(study.trials), "completed": done, "pruned": pruned,
        "failed": failed, "wall_seconds": round(time.time() - t0, 1),
        "best_params": best_params,
        "best_psnr": None if best_value is None else -best_value,
        "protocol": {"epochs": args.epochs, "size": args.size,
                     "n_train": args.n_train, "batch_size": args.batch_size,
                     "engine": args.engine, "bf16": args.bf16},
    }
    with open(args.csv + ".study.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
