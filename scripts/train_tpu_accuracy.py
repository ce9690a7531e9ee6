"""First end-to-end accuracy run: train RDUNet supervised on the real TPU.

VERDICT r2 #1b: no trained checkpoint exists anywhere (the reference ships
none), so this script produces the framework's first accuracy figure — train
RDUNet on synthetic DIV2K-style images with sigma=25 Gaussian noise (the
reference's synthetic-noise protocol, custom_dataset.py:83-87) and report
held-out-patch PSNR.  Target: >=28 dB at sigma=25 (noisy input is ~20.4 dB).

Runs the REAL product path end to end: ArrayPatch-style dataset -> PatchLoader
with the on-device degrade+normalize transform -> SupervisedTrainer at the
measured v5e sweet spot (batch 128, engine='xla', remat, bf16).

Usage (TPU, background):
    python scripts/train_tpu_accuracy.py --epochs 150 --base-filters 32
Prints one JSON line at the end; appends it to runs/accuracy_log.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_images(n, size, rng):
    """DIV2K-stand-in synthetic content: multi-scale smooth fields + flat
    geometric regions + soft stripes — structured enough that a denoiser can
    exploit spatial redundancy, varied enough not to be memorized."""
    from scipy.ndimage import gaussian_filter

    imgs = np.empty((n, size, size, 3), np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n):
        img = np.zeros((size, size, 3), np.float32)
        for blur, amp in ((16.0, 0.5), (6.0, 0.25), (2.0, 0.1)):
            f = gaussian_filter(
                rng.randn(size, size, 3).astype(np.float32), (blur, blur, 0)
            )
            img += amp * f / (np.abs(f).max() + 1e-6)
        for _ in range(rng.randint(4, 9)):  # flat ellipses
            cy, cx = rng.randint(0, size, 2)
            ry, rx = rng.randint(size // 16, size // 3, 2)
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
            color = rng.uniform(-0.8, 0.8, 3).astype(np.float32)
            img[mask] = img[mask] * 0.3 + color * 0.7
        if rng.rand() < 0.5:  # soft stripes
            period = rng.randint(8, 40)
            phase = rng.rand() * 6.28
            stripes = 0.15 * np.sin(2 * np.pi * xx / period + phase)
            img += stripes[..., None].astype(np.float32)
        lo, hi = img.min(), img.max()
        imgs[i] = np.clip((img - lo) / (hi - lo + 1e-6) * 255, 0, 255).astype(np.uint8)
    return imgs


def synth_train_val(n_train, n_val, size, seed=0,
                    cache_dir="runs/synth_cache"):
    """Deterministic (train, val) synthetic pair with an on-disk cache.

    Generation is pure CPU (scipy gaussian_filter) and costs ~3 min at
    2048x256^2 — sweep scripts re-generate the identical arrays for every
    config, so cache the pair keyed by the full RNG recipe.  The two calls
    share one RandomState, so the val set depends on the train draw; the
    cache stores both together to preserve that coupling."""
    path = os.path.join(cache_dir, f"synth_{seed}_{size}_{n_train}_{n_val}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["train"], z["val"]
    rng = np.random.RandomState(seed)
    train = synth_images(n_train, size, rng)
    val = synth_images(n_val, size, rng)
    os.makedirs(cache_dir, exist_ok=True)
    # keep the .npz suffix LAST — np.savez appends one otherwise
    tmp = f"{path[:-4]}.{os.getpid()}.tmp.npz"
    np.savez_compressed(tmp, train=train, val=val)
    os.replace(tmp, path)  # atomic: concurrent writers cannot torn-read
    return train, val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", choices=("supervised", "diffusion"), default="supervised")
    ap.add_argument("--timesteps", type=int, default=20)
    ap.add_argument("--loss-weights", default="0,1,0",
                    help="diffusion combined_loss mse,charbonnier,ssim weights "
                         "(diffusion_RDUnet.py:60-65; reference default 0,1,0)")
    ap.add_argument("--t-dist", choices=("uniform", "biased"), default="uniform",
                    help="diffusion timestep sampling: uniform ints or the "
                         "reference's Beta(2,1) bias toward T (:71-73)")
    ap.add_argument("--tag", default="", help="extra label for the output record")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--base-filters", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n-train", type=int, default=512)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument(
        "--sigma-list", default="",
        help="comma-separated noise levels (e.g. '10,20,30,40,50') for blind "
        "denoising: per-sample sigma drawn uniformly from the list at train "
        "time (the shuffled equivalent of custom_dataset.py:62-69's "
        "idx%%len(levels) cycling), val noise cycled deterministically per "
        "image with per-level PSNR breakdown; overrides --sigma",
    )
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--optimizer", default="", choices=("", "adam", "adamw"),
                    help="diffusion optimizer_choice override (empty = trainer "
                         "default) — lets a C13 search winner retrain at the "
                         "full accuracy protocol")
    ap.add_argument("--scheduler", default="", choices=("", "cosine", "step"),
                    help="diffusion scheduler_choice override (empty = trainer "
                         "default)")
    ap.add_argument("--engine", default="xla")
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument(
        "--sched-steps-per-epoch", type=int, default=0,
        help="virtual epoch length for the StepLR(3,.5) decay cadence; the "
        "reference's per-epoch decay assumes DIV2K-sized epochs, so with a small "
        "synthetic set pass e.g. total_steps//6 to get ~2 decays over the run "
        "(0 = use the real loader epoch length)",
    )
    ap.add_argument(
        "--device-data", action="store_true",
        help="keep the whole uint8 image bank resident in HBM and sample "
        "batches on device (data/resident.py) — removes the per-step "
        "host->device transfer that bounds small-model training on this "
        "runtime (BASELINE.md: ~0.57 s step vs ~2.3 s host-feed wall). "
        "Different RNG stream than the host loader (not byte-identical "
        "batches), so don't mix within one run",
    )
    ap.add_argument(
        "--remat", choices=("true", "false"), default="true",
        help="rematerialization in the train step. BASELINE.md guidance: "
        "RDUNet-32 wants remat=true at batch 128; the RDUNet-128 flagship "
        "wants remat=false at batch 8 (activations fit; remat only costs)",
    )
    ap.add_argument(
        "--ckpt-dir", default="",
        help="checkpoint directory (default runs/accuracy_ckpt[_diffusion]); "
        "set when training variants like the flagship so runs don't clobber",
    )
    ap.add_argument(
        "--ckpt-every", type=int, default=0,
        help="also checkpoint every N epochs mid-run (0 = final only). The "
        "axon tunnel can wedge for hours mid-run (CLAUDE.md); periodic "
        "checkpoints make a 90-min run resumable via --resume instead of "
        "all-or-nothing",
    )
    ap.add_argument("--out", default="runs/accuracy_log.jsonl")
    ap.add_argument(
        "--resume", default="",
        help="checkpoint path to resume from (orbax sidecar preferred; "
        "continues for --epochs MORE epochs)",
    )
    args = ap.parse_args()

    # diffusion-only knobs must not silently label a supervised run as an
    # ablation it never ran (the appended JSON record is the evidence of
    # record); reject BEFORE any data generation / device work
    if args.algo == "supervised" and (
        args.loss_weights != "0,1,0" or args.t_dist != "uniform"
        or args.optimizer or args.scheduler
    ):
        sys.exit("--loss-weights/--t-dist/--optimizer/--scheduler only apply "
                 "to --algo diffusion")

    import jax
    import jax.numpy as jnp

    from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from vub_image_denoising_tpu.data.device import (
        add_gaussian_noise_u8, degrade_and_normalize, denormalize,
    )
    from vub_image_denoising_tpu.data.loader import PatchLoader
    from vub_image_denoising_tpu.eval.metrics import psnr_per_image
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.train import DiffusionTrainer, SupervisedTrainer

    print(f"generating {args.n_train}+{args.n_val} synthetic {args.size}^2 images...",
          flush=True)
    t0 = time.time()
    train_clean, val_clean = synth_train_val(args.n_train, args.n_val, args.size)
    print(f"  done in {time.time() - t0:.0f}s", flush=True)

    class CleanDS:
        channels = 3

        def __len__(self):
            return len(train_clean)

        def __getitem__(self, i):
            return (train_clean[i],)

        def gather_batch(self, indices):
            return (train_clean[np.asarray(indices, np.int64)],)

    sigma = args.sigma
    sigma_list = (
        [float(s) for s in args.sigma_list.split(",")] if args.sigma_list else None
    )

    if sigma_list is not None:
        levels = jnp.asarray(sigma_list, jnp.float32)

        @jax.jit
        def tf(key, clean_u8):
            k_lvl, k_deg = jax.random.split(key)
            per_sample = jax.random.choice(k_lvl, levels, (clean_u8.shape[0],))
            return degrade_and_normalize(k_deg, clean_u8, per_sample)

    else:

        @jax.jit
        def tf(key, clean_u8):
            return degrade_and_normalize(key, clean_u8, sigma)

    remat = args.remat == "true"
    if args.algo == "diffusion":
        opt_kw = {}
        if args.optimizer:
            opt_kw["optimizer_choice"] = args.optimizer
        if args.scheduler:
            opt_kw["scheduler_choice"] = args.scheduler
        trainer = DiffusionTrainer(
            base_filters=args.base_filters, timesteps=args.timesteps, lr=args.lr,
            engine=args.engine, remat=remat, compute_dtype=jnp.bfloat16,
            loss_weights=tuple(float(w) for w in args.loss_weights.split(",")),
            distribution_choice=args.t_dist,
            output_dir=args.ckpt_dir or "runs/accuracy_ckpt_diffusion",
            **opt_kw,
        )
    else:
        model = RDUNet(channels=3, base_filters=args.base_filters)
        trainer = SupervisedTrainer(
            model, lr=args.lr, engine=args.engine, remat=remat,
            compute_dtype=jnp.bfloat16,
            checkpoint_dir=args.ckpt_dir or "runs/accuracy_ckpt",
        )
    if args.device_data:
        from vub_image_denoising_tpu.data.resident import DeviceBankLoader

        loader = DeviceBankLoader(
            train_clean, args.batch_size, transform=tf,
            steps_per_epoch=max(1, len(train_clean) // args.batch_size),
            sharding=trainer.batch_sharding(), seed=1,
        )
    else:
        loader = PatchLoader(
            CleanDS(), args.batch_size, shuffle=True, transform=tf,
            sharding=trainer.batch_sharding(), seed=1,
        )
    steps_per_epoch = max(1, len(loader))
    state = trainer.init(
        jax.random.PRNGKey(0),
        jnp.zeros((args.batch_size, args.size, args.size, 3), jnp.bfloat16),
        steps_per_epoch=args.sched_steps_per_epoch or steps_per_epoch,
    )
    start_epoch = 0
    if args.resume:
        state, start_epoch = trainer.load_checkpoint(state, args.resume)
        # continue the RNG streams where the original run left them: the loader
        # shuffle is seed+epoch and the noise/timestep keys fold in the epoch
        # number, so a continuation must NOT restart the epoch counter at 0 (it
        # would replay byte-identical batches/noise of the original run)
        loader.epoch = start_epoch
        print(f"resumed from {args.resume} (epoch {start_epoch})", flush=True)

    # fixed held-out noisy/clean pairs (quantized-uint8 noise, the C1 model)
    if sigma_list is not None:
        val_sigmas = np.asarray(
            [sigma_list[i % len(sigma_list)] for i in range(len(val_clean))],
            np.float32,
        )
    else:
        val_sigmas = np.full((len(val_clean),), sigma, np.float32)
    val_noisy_u8 = np.asarray(jax.device_get(add_gaussian_noise_u8(
        jax.random.PRNGKey(123), jnp.asarray(val_clean), jnp.asarray(val_sigmas)
    )))

    # diffusion eval runs the FULL T-step improved sampler (the product's eval
    # path); batch 8 is the measured sampler sweet spot (BASELINE.md round 2)
    eval_bs = 8 if args.algo == "diffusion" else 32

    def evaluate(state):
        psnrs = []
        for s in range(0, len(val_clean), eval_bs):
            noisy_u8 = jnp.asarray(val_noisy_u8[s : s + eval_bs])
            clean_u8 = jnp.asarray(val_clean[s : s + eval_bs])
            noisy = ((noisy_u8.astype(jnp.float32) / 255.0) - 0.5) / 0.5
            if args.algo == "diffusion":
                out = trainer._jit_sample(state.params, noisy.astype(jnp.bfloat16))
            else:
                out = trainer.evaluate_batch(state, noisy.astype(jnp.bfloat16))
            p = psnr_per_image(
                clean_u8.astype(jnp.float32) / 255.0,
                jnp.clip(denormalize(out.astype(jnp.float32)), 0.0, 1.0),
                data_range=1.0,
            )
            psnrs.extend(np.asarray(jax.device_get(p), np.float64).tolist())
        return float(np.mean(psnrs)), np.asarray(psnrs)

    # noisy-input baseline PSNR at this sigma
    base_psnrs = []
    for s in range(0, len(val_clean), 32):
        c = val_clean[s : s + 32].astype(np.float32) / 255.0
        nz = val_noisy_u8[s : s + 32].astype(np.float32) / 255.0
        mse = ((c - nz) ** 2).mean(axis=(1, 2, 3))
        base_psnrs.extend((10 * np.log10(1.0 / mse)).tolist())
    psnr_noisy = float(np.mean(base_psnrs))
    sig_desc = sigma_list if sigma_list is not None else sigma
    print(f"noisy-input PSNR @ sigma={sig_desc}: {psnr_noisy:.2f} dB", flush=True)

    best = -1.0
    t_train0 = time.time()
    end_epoch = start_epoch + args.epochs

    # --- snapshot-safety (VERDICT r4 #8): a killed run must still leave a
    # usable evidence row.  Every eval atomically rewrites
    # <ckpt_dir>/progress.json (survives SIGKILL), and a SIGTERM — what
    # `timeout` and queue teardown send — appends a {"partial": true} row with
    # the best-so-far PSNR to the accuracy log before exiting.
    ckpt_dir = args.ckpt_dir or (
        "runs/accuracy_ckpt_diffusion" if args.algo == "diffusion"
        else "runs/accuracy_ckpt"
    )
    partial = {
        "metric": f"rdunet_{args.algo}_synthetic_psnr",
        "sigma": None if sigma_list is not None else sigma,
        "tag": args.tag or None,
        "base_filters": args.base_filters,
        "epochs_target": end_epoch,
        "psnr_noisy_db": round(psnr_noisy, 2),
    }

    def _flush_progress():
        os.makedirs(ckpt_dir, exist_ok=True)
        tmp = os.path.join(ckpt_dir, f".progress.{os.getpid()}.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(partial) + "\n")
        os.replace(tmp, os.path.join(ckpt_dir, "progress.json"))

    def _on_sigterm(signum, frame):
        if "psnr_best_db" in partial:
            rec = dict(partial)
            rec["partial"] = True
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
        os._exit(143)  # skip jax/orbax teardown: the runtime may be wedged

    import signal

    signal.signal(signal.SIGTERM, _on_sigterm)

    for epoch in range(start_epoch, end_epoch):
        te = time.time()
        if args.algo == "diffusion":
            state, loss = trainer.train_epoch(state, loader, jax.random.PRNGKey(7), epoch)
        else:
            state, loss = trainer.train_epoch(state, loader, epoch)
        if (epoch + 1) % args.eval_every == 0 or epoch == end_epoch - 1:
            p, _ = evaluate(state)
            best = max(best, p)
            partial.update(epochs_done=epoch + 1, psnr_denoised_db=round(p, 2),
                           psnr_best_db=round(best, 2),
                           train_seconds=round(time.time() - t_train0, 1))
            _flush_progress()
            print(
                f"epoch {epoch + 1}/{end_epoch} loss {loss:.4f} "
                f"val PSNR {p:.2f} dB (best {best:.2f}) "
                f"[{time.time() - te:.1f}s/epoch]",
                flush=True,
            )
        else:
            print(f"epoch {epoch + 1}/{end_epoch} loss {loss:.4f} "
                  f"[{time.time() - te:.1f}s/epoch]", flush=True)
        # periodic mid-run checkpoint (tunnel-outage insurance) under a
        # distinct mid_ name: the manifest's liveness markers must never
        # mistake an interrupted run for the completed artifact
        # (regen_artifacts.py; ADVICE r4).  The final save below is
        # authoritative.  --resume accepts the mid_ path directly.
        if (args.ckpt_every and (epoch + 1) % args.ckpt_every == 0
                and epoch != end_epoch - 1):
            if args.algo == "diffusion":
                trainer.save_epoch_checkpoint(state, epoch, name="mid_checkpoint.pth")
            else:
                trainer.maybe_checkpoint(state, epoch, force=True,
                                         name="mid_rdunet_denoising.pth")

    final, per_image = evaluate(state)
    best = max(best, final)
    # label checkpoints/results with the GLOBAL epoch (resume offset included)
    # so a continuation never clobbers the checkpoint it resumed from
    global_last = start_epoch + args.epochs - 1
    if args.algo == "diffusion":
        trainer.save_epoch_checkpoint(state, global_last)
    else:
        trainer.maybe_checkpoint(state, global_last, force=True)
    result = {
        "metric": f"rdunet_{args.algo}_synthetic_psnr",
        # the scalar sigma is meaningless (unused) under --sigma-list
        "sigma": None if sigma_list is not None else sigma,
        "tag": args.tag or None,
        "base_filters": args.base_filters,
        "epochs": global_last + 1,
        "steps": (global_last + 1) * steps_per_epoch,
        "psnr_noisy_db": round(psnr_noisy, 2),
        "psnr_denoised_db": round(final, 2),
        "psnr_best_db": round(best, 2),
        "train_seconds": round(time.time() - t_train0, 1),
        # every row records its lr: the round-5 s25 regen silently ran at the
        # 1e-4 default (27.97 dB) because the manifest command omitted the
        # recorded protocol's --lr 3e-4 and old supervised rows carried no lr
        # field to catch it against
        "lr": args.lr,
    }
    if args.algo == "diffusion":
        result["timesteps"] = args.timesteps
        result["loss_weights"] = args.loss_weights
        result["t_dist"] = args.t_dist
        if args.optimizer:
            result["optimizer"] = args.optimizer
        if args.scheduler:
            result["scheduler"] = args.scheduler
    if start_epoch:
        result["resumed_from_epoch"] = start_epoch
    if sigma_list is not None:
        result["sigma_list"] = sigma_list
        result["psnr_by_sigma_db"] = {
            str(int(lv)): round(float(per_image[val_sigmas == lv].mean()), 2)
            for lv in sigma_list
        }
        result["psnr_noisy_by_sigma_db"] = {
            str(int(lv)): round(float(np.asarray(base_psnrs)[val_sigmas == lv].mean()), 2)
            for lv in sigma_list
        }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
