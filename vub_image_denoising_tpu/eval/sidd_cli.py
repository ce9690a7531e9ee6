"""CLI entry points for SIDD validation evaluation and Kaggle benchmark submission.

- ``main_validate``  — port of evaluate_SIDD/evaluate_SIDD.py:102-154: evaluate a
  diffusion checkpoint over a random 10% of the SIDD validation blocks, print avg
  PSNR/SSIM/inference-time, write benchmark_results.csv, save a debug sample plot.
- ``main_benchmark`` — port of evaluate_SIDD/benchmark.py: denoise the benchmark
  blocks with a checkpointed diffusion model and emit SubmitSrgb.csv for
  kaggle.com/competitions/sidd-benchmark-srgb-psnr.  The reference wget-downloads the
  .mat if missing (benchmark.py:61-68); this environment has no egress, so a missing
  file is an error with the URL printed.

Usage:
  python -m vub_image_denoising_tpu.eval.sidd_cli validate --checkpoint ck.pth \
      --noisy-mat ValidationNoisyBlocksSrgb.mat --gt-mat ValidationGtBlocksSrgb.mat
  python -m vub_image_denoising_tpu.eval.sidd_cli benchmark --checkpoint ck.pth \
      --benchmark-mat BenchmarkNoisyBlocksSrgb.mat
"""

import argparse
import os

import jax
import jax.numpy as jnp

from ..diffusion.interpolation import InterpolationDiffusion
from ..models.rdunet import RDUNetT
from ..utils import checkpoint as ckpt_io
from .sidd import SIDDMatBlocks, evaluate_sidd, make_kaggle_submission

BENCHMARK_URL = (
    "https://competitions.codalab.org/my/datasets/download/"
    "0d8a1e68-155d-4301-a8cd-9b829030d719"
)


def load_sampler(checkpoint_path: str, base_filters: int = 32, timesteps: int = 20,
                 bf16: bool = False, fused: bool = False, engine: str = "auto",
                 trusted: bool = False, pipeline_parallel: bool = False,
                 pipeline_microbatch: int = 0):
    """Build the jitted improved-sampling function from a .pth diffusion checkpoint.

    ``engine``: 'flax' (reference-exact conv order — the strict-f32 parity path),
    'xla' (optimized XLA engine: fastest throughput), 'pallas' (fused Pallas
    blocks: small-batch latency), or 'auto' (xla under bf16, flax under strict
    f32).  ``fused=True`` is back-compat for engine='pallas'.  ``trusted=True``
    allows the full-unpickling torch.load fallback for checkpoints that fail
    the safe weights-only path (pre-r3 files from this framework) — only for
    files the user supplied themselves.  ``pipeline_parallel=True`` chunks the
    T sampler steps over a ("stage",) mesh (parallel/pipeline.py — GPipe over
    the block stream): depth = the largest divisor of ``timesteps`` ≤ the
    device count, microbatch = ``pipeline_microbatch`` (0 → 2 blocks)."""
    unet = RDUNetT(base_filters=base_filters)
    dummy = jnp.zeros((1, 64, 64, 3))
    params = jax.eval_shape(unet.init, jax.random.PRNGKey(0), dummy, jnp.zeros((1,)))
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    params, _ = ckpt_io.load_pth(checkpoint_path, params, prefix="unet.",
                                 allow_pickle=trusted)
    diffusion = InterpolationDiffusion(timesteps=timesteps)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if not bf16:
        from .. import enable_strict_precision

        enable_strict_precision()  # exact-f32 parity path

    if fused:
        engine = "pallas"
    if engine == "auto":
        engine = "xla" if bf16 else "flax"
    if engine == "flax":
        apply_fn = unet.apply
    else:
        from ..models.fused_apply import rdunet_t_apply_fused

        apply_fn = lambda p, x, t: rdunet_t_apply_fused(p, x, t, engine=engine)

    if pipeline_parallel:
        from ..parallel.pipeline import (
            best_pipeline_depth,
            make_pp_mesh,
            pipeline_sample_fn,
        )

        depth = best_pipeline_depth(timesteps)
        mesh = make_pp_mesh(jax.devices()[:depth])
        inner = pipeline_sample_fn(
            diffusion, apply_fn, mesh, microbatch=pipeline_microbatch or 2
        )
        print(f"pipeline-parallel sampling: {depth} stages x "
              f"{timesteps // depth} steps")

        def sampler(noisy):
            return inner(params, noisy.astype(dtype)).astype(jnp.float32)

        return sampler

    @jax.jit
    def sampler(noisy):
        out = diffusion.improved_sampling(apply_fn, params, noisy.astype(dtype))
        return out.astype(jnp.float32)

    return sampler


def main_validate(args):
    blocks = SIDDMatBlocks(args.noisy_mat, args.gt_mat)
    sampler = load_sampler(args.checkpoint, args.base_filters, args.timesteps,
                           args.bf16, getattr(args, "fused", False),
                           getattr(args, "engine", "auto"),
                           trusted=getattr(args, "trusted_checkpoint", False),
                           pipeline_parallel=getattr(args, "pipeline_parallel", False),
                           pipeline_microbatch=getattr(args, "pipeline_microbatch", 0))
    results = evaluate_sidd(
        sampler, blocks, evaluation_percentage=args.evaluation_percentage,
        batch_size=args.batch_size, seed=args.seed, csv_path=args.csv,
    )
    print(f"Average PSNR: {results['avg_psnr']:.2f}")
    print(f"Average SSIM: {results['avg_ssim']:.4f}")
    print(f"Average Inference Time: {results['avg_inference_time_ms']:.2f} ms")
    print(f"On-device Inference Time: {results['device_inference_time_ms']:.2f} ms")
    return results


def main_benchmark(args):
    if not os.path.exists(args.benchmark_mat):
        raise FileNotFoundError(
            f"{args.benchmark_mat} not found; download it from {BENCHMARK_URL}"
        )
    sampler = load_sampler(args.checkpoint, args.base_filters, args.timesteps,
                           args.bf16, getattr(args, "fused", False),
                           trusted=getattr(args, "trusted_checkpoint", False))
    out = make_kaggle_submission(sampler, args.benchmark_mat, args.output,
                                 batch_size=args.batch_size)
    print(f"Saved submission to {out}")
    print("Submit the output file SubmitSrgb.csv at")
    print("kaggle.com/competitions/sidd-benchmark-srgb-psnr")
    return out


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA compile cache across runs
    p = argparse.ArgumentParser(description="SIDD evaluation / benchmark")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate")
    v.add_argument("--checkpoint", required=True)
    v.add_argument("--noisy-mat", default="evaluate_SIDD/ValidationNoisyBlocksSrgb.mat")
    v.add_argument("--gt-mat", default="evaluate_SIDD/ValidationGtBlocksSrgb.mat")
    v.add_argument("--base-filters", type=int, default=32)
    v.add_argument("--timesteps", type=int, default=20)
    v.add_argument("--evaluation-percentage", type=float, default=0.1)
    v.add_argument("--batch-size", type=int, default=8)
    v.add_argument("--seed", type=int, default=0)
    v.add_argument("--csv", default="benchmark_results.csv")
    v.add_argument("--bf16", action="store_true")
    v.add_argument("--fused", action="store_true",
                   help="use the Pallas fused-block engine (small-batch latency path)")
    v.add_argument("--engine", default="auto", choices=["auto", "flax", "xla", "pallas"])
    v.add_argument("--trusted-checkpoint", action="store_true",
                   help="allow the full-unpickling torch.load fallback for a "
                        "checkpoint that fails the safe weights-only load "
                        "(trusted files only)")
    v.add_argument("--pipeline-parallel", action="store_true",
                   help="chunk the T sampler steps over a multi-device 'stage' "
                        "mesh and stream blocks through (parallel/pipeline.py)")
    v.add_argument("--pipeline-microbatch", type=int, default=0,
                   help="blocks per in-flight pipeline microbatch (0 -> 2)")

    b = sub.add_parser("benchmark")
    b.add_argument("--checkpoint", required=True)
    b.add_argument("--trusted-checkpoint", action="store_true",
                   help="allow the full-unpickling torch.load fallback "
                        "(trusted files only)")
    b.add_argument("--benchmark-mat", default="evaluate_SIDD/BenchmarkNoisyBlocksSrgb.mat")
    b.add_argument("--output", default="SubmitSrgb.csv")
    b.add_argument("--base-filters", type=int, default=32)
    b.add_argument("--timesteps", type=int, default=20)
    b.add_argument("--batch-size", type=int, default=8)
    b.add_argument("--bf16", action="store_true")
    b.add_argument("--fused", action="store_true")

    args = p.parse_args(argv)
    if args.cmd == "validate":
        return main_validate(args)
    return main_benchmark(args)


if __name__ == "__main__":
    main()
