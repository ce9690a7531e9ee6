"""End-to-end SIDD-eval drive on real TPU with synthetic .mat data.

Builds ValidationNoisy/GtBlocksSrgb.mat fixtures + an RDUNet_T-32 checkpoint,
then runs eval/sidd.py::evaluate_sidd through eval/sidd_cli.py::load_sampler for each
engine, reporting wall-clock and on-device per-block times (the pipelined-transfer
rework of VERDICT r1 #9) and checking the engines agree on PSNR/SSIM.

Default mode (random blocks + random checkpoint) measures TIMING only.  With
``--checkpoint <trained.pth> --content synthetic`` the blocks are structured
synthetic images (train_tpu_accuracy.synth_images) with the training noise
model (quantized uint8 Gaussian), so the reported PSNR/SSIM is a real
end-to-end accuracy figure through the full C20 SIDD path
(evaluate_SIDD/evaluate_SIDD.py conventions: data_range=2 on [-1,1]).

Run from repo root: python scripts/measure_sidd_eval.py
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import scipy.io

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="",
                    help="trained .pth (default: random init — timing only)")
    ap.add_argument("--content", choices=("random", "synthetic"), default="random")
    ap.add_argument("--sigma", type=float, default=25.0,
                    help="noise level for --content synthetic")
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--engines", default="flax,xla,pallas")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    from vub_image_denoising_tpu.eval.sidd import SIDDMatBlocks, evaluate_sidd
    from vub_image_denoising_tpu.eval.sidd_cli import load_sampler
    from vub_image_denoising_tpu.models.rdunet import RDUNetT
    from vub_image_denoising_tpu.utils import checkpoint as ckpt_io

    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    if args.content == "synthetic":
        from train_tpu_accuracy import synth_images

        from vub_image_denoising_tpu.data.device import add_gaussian_noise_u8

        n = args.scenes * 24
        imgs = synth_images(n, 256, rng)
        gt = imgs.reshape(args.scenes, 24, 256, 256, 3)
        noisy = np.asarray(jax.device_get(add_gaussian_noise_u8(
            jax.random.PRNGKey(5), jnp.asarray(imgs), args.sigma
        ))).reshape(gt.shape)
    else:
        gt = rng.randint(0, 256, (args.scenes, 24, 256, 256, 3), np.uint8)
        noisy = np.clip(gt.astype(np.int32) + rng.randint(-25, 25, gt.shape), 0, 255
                        ).astype(np.uint8)
    scipy.io.savemat(os.path.join(tmp, "noisy.mat"), {"ValidationNoisyBlocksSrgb": noisy})
    scipy.io.savemat(os.path.join(tmp, "gt.mat"), {"ValidationGtBlocksSrgb": gt})

    if args.checkpoint:
        ckpt = args.checkpoint
    else:
        unet = RDUNetT(base_filters=32)
        params = jax.jit(unet.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                                    jnp.zeros((1,)))
        ckpt = os.path.join(tmp, "ck.pth")
        ckpt_io.save_pth(ckpt, params, prefix="unet.")

    blocks = SIDDMatBlocks(os.path.join(tmp, "noisy.mat"), os.path.join(tmp, "gt.mat"))
    ref = None
    for engine in args.engines.split(","):
        # --checkpoint files are user-supplied -> trusted for the unpickling
        # fallback (pre-r3 checkpoints from this framework carry a pickled
        # optax tree)
        sampler = load_sampler(ckpt, bf16=True, engine=engine,
                               trusted=bool(args.checkpoint))
        res = evaluate_sidd(sampler, blocks, evaluation_percentage=1.0, batch_size=8,
                            csv_path=None)
        print(f"{engine:7s} wall {res['avg_inference_time_ms']:7.1f} ms/blk  "
              f"device {res['device_inference_time_ms']:7.1f} ms/blk  "
              f"psnr {res['avg_psnr']:.3f} ssim {res['avg_ssim']:.4f} "
              f"({res['n_blocks']} blocks)", flush=True)
        if ref is None:
            ref = res
        else:
            assert abs(res["avg_psnr"] - ref["avg_psnr"]) < 0.05, "engines disagree"


if __name__ == "__main__":
    main()
