"""AOT model export: self-contained serialized StableHLO serving artifacts.

Greenfield production-deployment surface (the reference ships raw ``.pth``
files that need its Python model code to run, RDUNet_model.py:263-266).
``jax.export`` lowers the jitted denoiser ONCE — params baked in as
constants — into a versioned, platform-tagged StableHLO artifact that any
JAX process (or a C++ PJRT runner) can deserialize and call without this
package's model code, the checkpoint file, or a Python re-trace.  Artifacts
are lowered for BOTH cpu and tpu by default, and the batch dimension is
symbolic, so one artifact serves any batch size at the fixed spatial size.

Usage:
  python -m vub_image_denoising_tpu.eval.export --checkpoint ck.pth \
      --arch rdunet --size 256 --bf16 --out rdunet_256.jaxexport
  # then anywhere:
  from vub_image_denoising_tpu.eval.export import load_exported
  fn = load_exported("rdunet_256.jaxexport")   # (N,256,256,3) -> (N,256,256,3)
"""

import argparse

import jax
import jax.numpy as jnp
from jax import export as jax_export


def build_exported(
    checkpoint: str,
    arch: str = "rdunet",
    base_filters: int = 32,
    timesteps: int = 20,
    size: int = 256,
    channels: int = 3,
    bf16: bool = False,
    engine: str = "auto",
    platforms=("cpu", "tpu"),
    symbolic_batch: bool = True,
    trusted: bool = False,
):
    """Lower the denoiser (params baked in) to a ``jax.export.Exported``.

    Model/checkpoint construction is ``denoise_cli.build_apply`` — the same
    builder every inference entry point uses (so export cannot drift from the
    CLI/server, e.g. the diffusion-requires-RGB guard); the exported callable
    maps a normalized ``(N, size, size, C)`` [-1,1] float32 batch to its
    denoised counterpart (diffusion: the full T-step improved sampler).
    """
    from .denoise_cli import build_apply

    forward, params = build_apply(
        checkpoint, arch, base_filters, timesteps,
        channels=channels, bf16=bf16, engine=engine, trusted=trusted,
    )

    def fn(x):
        return forward(params, x)

    if symbolic_batch:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = 1
    spec = jax.ShapeDtypeStruct((b, size, size, channels), jnp.float32)
    return jax_export.export(jax.jit(fn), platforms=tuple(platforms))(spec)


def save_exported(exported, path: str) -> str:
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_exported(path: str):
    """Deserialize an artifact -> callable ``(N, size, size, C) -> same``.

    Needs only jax (any backend the artifact was lowered for) — not this
    package's model code or the original checkpoint."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def fn(x):
        return exported.call(x)

    fn.exported = exported
    return fn


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export a checkpoint as a self-contained StableHLO artifact"
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--arch", default="rdunet", choices=["rdunet", "diffusion"])
    p.add_argument("--base-filters", type=int, default=32)
    p.add_argument("--timesteps", type=int, default=20)
    p.add_argument("--size", type=int, default=256,
                   help="spatial size the artifact is lowered for "
                        "(batch stays symbolic)")
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "flax", "xla", "pallas"])
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--fixed-batch", action="store_true",
                   help="lower for batch 1 instead of a symbolic batch dim")
    p.add_argument("--trusted-checkpoint", action="store_true")
    p.add_argument("--out", required=True, help="output artifact path")
    args = p.parse_args(argv)

    exported = build_exported(
        args.checkpoint, args.arch, args.base_filters, args.timesteps,
        size=args.size, channels=1 if args.grayscale else 3, bf16=args.bf16,
        engine=args.engine, platforms=tuple(args.platforms.split(",")),
        symbolic_batch=not args.fixed_batch, trusted=args.trusted_checkpoint,
    )
    path = save_exported(exported, args.out)
    import os

    print(f"exported {args.arch} ({args.size}px, platforms "
          f"{args.platforms}) -> {path} [{os.path.getsize(path) / 1e6:.1f} MB]")
    return path


if __name__ == "__main__":
    main()
