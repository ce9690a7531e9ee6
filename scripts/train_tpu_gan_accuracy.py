"""GAN-family accuracy run on the real TPU.

Supervised and diffusion have trained accuracy figures (runs/accuracy_log.jsonl);
this script produces them for the remaining two trainer families — RCA-GAN
(paper_gan.py:317-457) and the attention-U-Net denoising GAN
(train_denoising_gan.py:173-294) — on the same synthetic protocol: grayscale
DIV2K-stand-in content, fixed sigma-noise degraded/gt pairs (the reference GANs
train on FIXED paired folders, not per-step noise), held-out PSNR of the
eval-mode generator.

Usage (TPU, background):
    python scripts/train_tpu_gan_accuracy.py --algo rca --epochs 40
Prints one JSON line at the end; appends it to runs/accuracy_log.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from train_tpu_accuracy import synth_train_val  # noqa: E402  (same content recipe)


class PairLoader:
    """Shuffled minibatches over FIXED (degraded, gt) uint8 pairs, normalized
    to [-1,1] at yield time (Normalize(0.5, 0.5), the reference's transform)."""

    def __init__(self, deg_u8, gt_u8, batch_size, seed=0, shuffle=True):
        import jax.numpy as jnp

        self._jnp = jnp
        self.deg, self.gt = deg_u8, gt_u8
        self.bs = int(batch_size)
        self.rng = np.random.RandomState(seed)
        self.shuffle = shuffle

    def __len__(self):
        return max(1, len(self.deg) // self.bs)

    def _norm(self, u8):
        return self._jnp.asarray(u8.astype(np.float32) / 255.0 * 2.0 - 1.0)

    def __iter__(self):
        order = (self.rng.permutation(len(self.deg)) if self.shuffle
                 else np.arange(len(self.deg)))
        for s in range(len(self)):
            idx = order[s * self.bs:(s + 1) * self.bs]
            yield self._norm(self.deg[idx]), self._norm(self.gt[idx])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", choices=("rca", "attention", "hybrid"), default="rca")
    ap.add_argument("--critic-norm", choices=("bn", "none", "layernorm"), default="bn",
                    help="RCA critic normalization (the BN-divergence ablation; "
                         "'bn' is the reference architecture)")
    ap.add_argument("--num-timesteps", type=int, default=1000,
                    help="DDPM timesteps for --algo hybrid")
    ap.add_argument("--tag", default="", help="extra label for the output record")
    # RCA multimodal G-objective slot weights (named by SLOT semantics, not the
    # reference's shifted argument names — see train/gan.py field comments):
    # feat = VGG-feature MSE (slot 1), content = pixel L1 (slot 2),
    # texture = gram MSE (slot 3), adv = WGAN adversarial (slot 4).
    # Defaults (-1) keep the reference values (1, 0.01, 0.001, 1).
    ap.add_argument("--lam-feat", type=float, default=-1.0)
    ap.add_argument("--lam-content", type=float, default=-1.0)
    ap.add_argument("--lam-texture", type=float, default=-1.0)
    ap.add_argument("--lam-adv", type=float, default=-1.0)
    ap.add_argument("--adv-ramp-steps", type=int, default=0,
                    help="linear warm-up of the adversarial G-slot over this "
                         "many steps (0 = reference behavior); the round-4 "
                         "ablation's late-erosion stabilizer (rca/hybrid only)")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument("--lr", type=float, default=0.0,
                    help="0 = the reference default (rca 5e-5, attention 1e-4)")
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--ckpt-dir", default="")
    ap.add_argument("--out", default="runs/accuracy_log.jsonl")
    args = ap.parse_args()

    # the attention GAN applies neither the RCA critic norm nor the --lam-*
    # slot weights: reject BEFORE any data generation / device work rather
    # than record a config that was never applied (the JSON record appended
    # at the end is the evidence of record)
    if args.algo == "attention" and (
        args.critic_norm != "bn" or args.adv_ramp_steps
        or any(getattr(args, f) >= 0 for f in
               ("lam_feat", "lam_content", "lam_texture", "lam_adv"))
    ):
        sys.exit("--critic-norm/--lam-*/--adv-ramp-steps only apply to "
                 "--algo rca/hybrid")

    import jax
    import jax.numpy as jnp

    from vub_image_denoising_tpu.data.device import add_gaussian_noise_u8
    from vub_image_denoising_tpu.eval.metrics import psnr_per_image
    from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    print(f"generating {args.n_train}+{args.n_val} synthetic {args.size}^2 "
          "grayscale images...", flush=True)
    t0 = time.time()
    # grayscale = luma of the RGB recipe (the paper GANs train on 1-channel pairs)
    train_rgb, val_rgb = synth_train_val(args.n_train, args.n_val, args.size)
    train_gt = train_rgb.mean(axis=-1, keepdims=True).astype(np.uint8)
    val_gt = val_rgb.mean(axis=-1, keepdims=True).astype(np.uint8)
    print(f"  done in {time.time() - t0:.0f}s", flush=True)

    # FIXED degraded pairs (quantized-uint8 noise, the C1 model)
    def degrade(gt_u8, key):
        sig = jnp.full((len(gt_u8),), args.sigma, jnp.float32)
        return np.asarray(jax.device_get(
            add_gaussian_noise_u8(key, jnp.asarray(gt_u8), sig)
        ))

    train_deg = degrade(train_gt, jax.random.PRNGKey(7))
    val_deg = degrade(val_gt, jax.random.PRNGKey(123))

    ckpt_dir = args.ckpt_dir or f"runs/accuracy_ckpt_gan_{args.algo}"
    # slot-weight overrides -> RCAGANTrainer's (shifted) field names
    lam_kw = {}
    for flag, field in (("lam_feat", "lambda_pixel"),
                        ("lam_content", "lambda_perceptual"),
                        ("lam_texture", "lambda_texture"),
                        ("lam_adv", "lambda_adv")):
        v = getattr(args, flag)
        if v >= 0:
            lam_kw[field] = v
    if args.algo == "rca":
        from vub_image_denoising_tpu.train.gan import RCAGANTrainer

        trainer = RCAGANTrainer(
            checkpoint_dir=ckpt_dir, disc_input_hw=args.size,
            critic_norm=args.critic_norm, adv_ramp_steps=args.adv_ramp_steps,
            **lam_kw,
            **({"lr": args.lr} if args.lr else {}),
        )
    elif args.algo == "hybrid":
        # C17: the diffusion-GAN hybrid (experimental_diffusion_gan.py:390-395)
        from vub_image_denoising_tpu.models.experimental import GeneratorWithDiffusion
        from vub_image_denoising_tpu.train.gan import RCAGANTrainer

        trainer = RCAGANTrainer(
            generator=GeneratorWithDiffusion(1, 1, num_timesteps=args.num_timesteps),
            checkpoint_dir=ckpt_dir, disc_input_hw=args.size,
            critic_norm=args.critic_norm, adv_ramp_steps=args.adv_ramp_steps,
            **lam_kw,
            **({"lr": args.lr} if args.lr else {}),
        )
    else:
        from vub_image_denoising_tpu.train.denoising_gan import DenoisingGANTrainer

        trainer = DenoisingGANTrainer(
            checkpoint_dir=ckpt_dir,
            **({"lr": args.lr} if args.lr else {}),
        )

    loader = PairLoader(train_deg, train_gt, args.batch_size, seed=1)
    sample = jnp.zeros((args.batch_size, args.size, args.size, 1), jnp.float32)
    state = trainer.init(jax.random.PRNGKey(0), sample, steps_per_epoch=len(loader))
    if args.algo == "hybrid":
        # the hybrid module's own init (experimental_diffusion_gan.py:405-414)
        from vub_image_denoising_tpu.train.gan import weights_init_normal

        ki, kd = jax.random.split(jax.random.PRNGKey(1))
        state = state.replace(
            g_params=weights_init_normal(state.g_params, ki),
            d_params=weights_init_normal(state.d_params, kd),
        )

    val_deg_n = jnp.asarray(val_deg.astype(np.float32) / 255.0 * 2.0 - 1.0)
    val_gt01 = jnp.asarray(val_gt.astype(np.float32) / 255.0)

    def evaluate(state):
        outs = []
        for s in range(0, len(val_deg), 32):
            if args.algo == "hybrid":
                out = trainer.generate(state, val_deg_n[s:s + 32], jax.random.PRNGKey(s))
            else:
                out = trainer._jit_gen_eval(
                    state.g_params, state.g_stats, val_deg_n[s:s + 32]
                )
            outs.append(jnp.clip((out.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0))
        p = psnr_per_image(val_gt01, jnp.concatenate(outs), data_range=1.0)
        return float(np.mean(np.asarray(jax.device_get(p), np.float64)))

    mse = ((val_gt.astype(np.float32) / 255 - val_deg.astype(np.float32) / 255) ** 2
           ).mean(axis=(1, 2, 3))
    psnr_noisy = float(np.mean(10 * np.log10(1.0 / mse)))
    print(f"noisy-input PSNR @ sigma={args.sigma}: {psnr_noisy:.2f} dB", flush=True)

    # --- snapshot-safety (VERDICT r4 #8, same scheme as train_tpu_accuracy):
    # every eval atomically rewrites <ckpt_dir>/progress.json, and SIGTERM
    # (what `timeout`/queue teardown send) appends a {"partial": true} row
    partial = {"metric": "gan_synthetic_psnr", "algo": args.algo,
               "tag": args.tag or None, "size": args.size,
               "n_train": args.n_train, "epochs_target": args.epochs,
               "psnr_noisy_db": round(psnr_noisy, 2)}

    def _flush_progress():
        os.makedirs(ckpt_dir, exist_ok=True)
        tmp = os.path.join(ckpt_dir, f".progress.{os.getpid()}.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(partial) + "\n")
        os.replace(tmp, os.path.join(ckpt_dir, "progress.json"))

    def _on_sigterm(signum, frame):
        if "psnr_best_db" in partial:
            rec2 = dict(partial)
            rec2["partial"] = True
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec2) + "\n")
            print(json.dumps(rec2), flush=True)
        os._exit(143)

    import signal

    signal.signal(signal.SIGTERM, _on_sigterm)

    key = jax.random.PRNGKey(42)
    best = -1.0
    t0 = time.time()
    for epoch in range(args.epochs):
        te = time.time()
        state, d_loss, g_loss = trainer.train_epoch(state, loader, key, epoch)
        line = (f"epoch {epoch + 1}/{args.epochs} d {d_loss:.4f} g {g_loss:.4f} "
                f"[{time.time() - te:.1f}s/epoch]")
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            psnr = evaluate(state)
            best = max(best, psnr)
            partial.update(epochs_done=epoch + 1, psnr_denoised_db=round(psnr, 2),
                           psnr_best_db=round(best, 2),
                           d_loss=round(d_loss, 3),
                           train_seconds=round(time.time() - t0, 1))
            _flush_progress()
            line += f" val PSNR {psnr:.2f} dB (best {best:.2f})"
        print(line, flush=True)
    train_seconds = time.time() - t0
    trainer.save_checkpoint(state, args.epochs - 1)

    rec = {
        "metric": "gan_synthetic_psnr",
        "algo": args.algo,
        # None for algos where the knob does not exist (attention)
        "critic_norm": args.critic_norm if args.algo in ("rca", "hybrid") else None,
        "n_train": args.n_train,
        "lr": args.lr or None,
        "tag": args.tag or None,
        "lambdas": lam_kw or None,
        "adv_ramp_steps": args.adv_ramp_steps or None,
        "sigma": args.sigma,
        "size": args.size,
        "epochs": args.epochs,
        "steps": args.epochs * len(loader),
        "psnr_noisy_db": round(psnr_noisy, 2),
        "psnr_denoised_db": round(psnr, 2),
        "psnr_best_db": round(best, 2),
        "d_loss_final": round(d_loss, 3),
        "g_loss_final": round(g_loss, 3),
        "train_seconds": round(train_seconds, 1),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
