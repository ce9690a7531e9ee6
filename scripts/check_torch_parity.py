"""North-star parity in the TORCH direction, on a TRAINED checkpoint (VERDICT r3 #5).

Round 3 proved forward parity (random weights) and trajectory parity (loss curves
rtol 2e-4); this closes the loop end-to-end on a real trained model: export the
framework-trained ``runs/accuracy_ckpt_s25`` checkpoint into a from-spec torch
RDUNet (``tests/test_model_torch_parity.py::TRDUNetCore``, strict=True), evaluate
BOTH frameworks' denoising PSNR on the exact held-out patches of the training
protocol (scripts/train_tpu_accuracy.py: synthetic 256² val set, quantized-uint8
sigma=25 noise, key 123) under strict f32, and assert |Δ| < 0.05 dB — the
BASELINE.json budget measured on a trained model rather than inferred.

Reference eval conventions: evaluate_model.py:36-51 (denormalize to [0,1],
PSNR data_range=1).

CPU-friendly (torch is CPU-only here):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/check_torch_parity.py
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from train_tpu_accuracy import synth_train_val  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="runs/accuracy_ckpt_s25/rdunet_denoising.pth")
    ap.add_argument("--base-filters", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n-train", type=int, default=512,
                    help="train-set size of the original run (only consumed to "
                         "advance the RNG so the val images match exactly)")
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--limit", type=int, default=16,
                    help="evaluate the first N val patches (both frameworks see "
                         "the same patches; 0 = all)")
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument("--budget-db", type=float, default=0.05)
    ap.add_argument("--out", default="runs/torch_parity.json")
    args = ap.parse_args()

    import torch

    import jax
    import jax.numpy as jnp

    from test_model_torch_parity import TRDUNetCore  # noqa: E402 (from-spec mirror)

    from vub_image_denoising_tpu import enable_strict_precision
    from vub_image_denoising_tpu.data.device import add_gaussian_noise_u8
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.utils.checkpoint import (
        load_torch_payload, torch_state_dict_to_params,
    )

    enable_strict_precision()

    # --- the training run's exact held-out protocol -------------------------
    print(f"regenerating protocol images ({args.n_train} train to advance RNG, "
          f"{args.n_val} val)...", flush=True)
    t0 = time.time()
    _, val_clean = synth_train_val(args.n_train, args.n_val, args.size)
    sig = jnp.full((len(val_clean),), args.sigma, jnp.float32)
    val_noisy_u8 = np.asarray(jax.device_get(add_gaussian_noise_u8(
        jax.random.PRNGKey(123), jnp.asarray(val_clean), sig
    )))
    print(f"  done in {time.time() - t0:.0f}s", flush=True)
    n = args.limit or len(val_clean)
    val_clean, val_noisy_u8 = val_clean[:n], val_noisy_u8[:n]

    clean01 = val_clean.astype(np.float32) / 255.0
    noisy = (val_noisy_u8.astype(np.float32) / 255.0 - 0.5) / 0.5  # [-1,1] NHWC

    def psnr(img01):
        mse = ((clean01 - img01) ** 2).reshape(n, -1).mean(axis=1)
        return 10.0 * np.log10(1.0 / mse)

    # --- JAX side: trained params through the product loader ----------------
    payload = load_torch_payload(args.checkpoint)
    sd = payload["model_state_dict"]
    model = RDUNet(channels=3, base_filters=args.base_filters)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    params = torch_state_dict_to_params(sd, template)

    fwd = jax.jit(model.apply)
    outs = []
    t0 = time.time()
    for s in range(0, n, 8):
        y = fwd(params, jnp.asarray(noisy[s:s + 8]))
        outs.append(np.asarray(jax.device_get(y), np.float32))
    jax_out01 = np.clip(np.concatenate(outs) * 0.5 + 0.5, 0.0, 1.0)
    jax_psnr = psnr(jax_out01)
    print(f"jax   eval: {time.time() - t0:.0f}s  PSNR {jax_psnr.mean():.4f} dB", flush=True)

    # --- torch side: same checkpoint, from-spec mirror, strict=True ---------
    tmodel = TRDUNetCore(3, args.base_filters, 3)
    tmodel.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
                           strict=True)
    tmodel.eval()
    t0 = time.time()
    touts = []
    with torch.no_grad():
        for s in range(0, n, 4):
            xt = torch.tensor(noisy[s:s + 4]).permute(0, 3, 1, 2)
            y = (tmodel(xt) + xt).permute(0, 2, 3, 1).numpy()  # global residual
            touts.append(y)
    torch_out01 = np.clip(np.concatenate(touts) * 0.5 + 0.5, 0.0, 1.0)
    torch_psnr = psnr(torch_out01)
    print(f"torch eval: {time.time() - t0:.0f}s  PSNR {torch_psnr.mean():.4f} dB", flush=True)

    delta = abs(float(jax_psnr.mean()) - float(torch_psnr.mean()))
    per_image_max = float(np.abs(jax_psnr - torch_psnr).max())
    rec = {
        "metric": "torch_direction_parity_db",
        "checkpoint": args.checkpoint,
        "n_patches": n,
        "jax_psnr_db": round(float(jax_psnr.mean()), 4),
        "torch_psnr_db": round(float(torch_psnr.mean()), 4),
        "abs_delta_db": round(delta, 5),
        "per_image_max_delta_db": round(per_image_max, 5),
        "budget_db": args.budget_db,
        "pass": bool(delta < args.budget_db),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)
    if not rec["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
