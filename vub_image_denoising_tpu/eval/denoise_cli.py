"""Denoise real images from the command line — the end-user inference surface.

The reference has no single-image entry point (its evaluators only consume
pre-cut SIDD ``.mat`` blocks, evaluate_SIDD.py:20-41, or DIV2K patch loaders);
this CLI closes that gap: load a reference-layout ``.pth`` checkpoint, denoise
a PNG/JPEG file or a folder of them at native resolution, write the results.

Arbitrary sizes are handled TPU-natively: images are reflect-padded to the
U-Net's stride (8) and run as ONE forward — no host-side 256x256 tiling, no
seams.  With more than one visible device, ``--tile-parallel`` shards the row
dimension across the mesh (parallel/tiles.py) so megapixel images are denoised
cooperatively with XLA inserting the halo exchanges.

Usage:
  python -m vub_image_denoising_tpu.eval.denoise_cli \
      --checkpoint model.pth --arch rdunet --input photo.png --output clean.png
  python -m vub_image_denoising_tpu.eval.denoise_cli \
      --checkpoint diff.pth --arch diffusion --timesteps 20 --input noisy_dir/ \
      --output out_dir/ --bf16
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import IMAGE_EXTENSIONS
from ..diffusion.interpolation import InterpolationDiffusion
from ..models.rdunet import RDUNet, RDUNetT
from ..utils import checkpoint as ckpt_io


def _zero_params(model, *example_args):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *example_args)
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def build_apply(checkpoint: str, arch: str = "rdunet", base_filters: int = 32,
                timesteps: int = 20, channels: int = 3, bf16: bool = False,
                engine: str = "auto", trusted: bool = False):
    """Shared model/checkpoint construction for every inference entry point
    (this CLI, eval/serve.py, eval/export.py — one builder so they cannot
    drift): returns ``(forward, params)`` where ``forward(params, batch)``
    maps a normalized ``(N,H,W,C)`` [-1,1] float32 batch to its denoised
    counterpart (diffusion: the full T-step improved sampler).

    arch 'rdunet'   — supervised denoiser (UNet/RDUNet_model.py layout).
    arch 'diffusion'— RDUNet_T + T-step improved sampling ('unet.'-prefixed
                      dicts, diffusion_RDUnet.py layout).
    """
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if not bf16:
        from .. import enable_strict_precision

        enable_strict_precision()
    if engine == "auto":
        engine = "xla" if bf16 else "flax"

    if arch == "rdunet":
        model = RDUNet(channels=channels, base_filters=base_filters)
        params = _zero_params(model, jnp.zeros((1, 64, 64, channels)))
        params, _ = ckpt_io.load_pth(checkpoint, params, allow_pickle=trusted)
        if engine == "flax":
            apply_fn = model.apply
        else:
            from ..models.fused_apply import rdunet_apply_fused

            apply_fn = lambda p, x: rdunet_apply_fused(p, x, engine=engine)

        def forward(p, batch):
            return apply_fn(p, batch.astype(dtype)).astype(jnp.float32)

    elif arch == "diffusion":
        if channels != 3:
            raise ValueError(
                "--arch diffusion requires RGB input (the reference RDUNet_T is "
                "fixed at 3+t channels, Unet_model.py:92-136); drop --grayscale"
            )
        unet = RDUNetT(base_filters=base_filters)
        params = _zero_params(unet, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)))
        params, _ = ckpt_io.load_pth(checkpoint, params, prefix="unet.",
                                     allow_pickle=trusted)
        diffusion = InterpolationDiffusion(timesteps=timesteps)
        if engine == "flax":
            unet_fn = unet.apply
        else:
            from ..models.fused_apply import rdunet_t_apply_fused

            unet_fn = lambda p, x, t: rdunet_t_apply_fused(p, x, t, engine=engine)

        def forward(p, batch):
            out = diffusion.improved_sampling(unet_fn, p, batch.astype(dtype))
            return out.astype(jnp.float32)

    else:
        raise ValueError(f"unknown arch '{arch}' (expected rdunet|diffusion)")

    return forward, params


def build_denoiser(checkpoint: str, arch: str = "rdunet", base_filters: int = 32,
                   timesteps: int = 20, channels: int = 3, bf16: bool = False,
                   engine: str = "auto", tile_parallel: bool = False,
                   tensor_parallel: bool = False, trusted: bool = False,
                   batched: bool = False):
    """(fn: (H,W,C) float32 [-1,1] -> (H,W,C) float32) from a .pth checkpoint.

    With ``batched=True`` the returned fn maps a stacked same-size batch
    ``(N,H,W,C) -> (N,H,W,C)`` in one device dispatch instead — the server's
    dynamic-batching path (eval/serve.py).  Incompatible with ``tile_parallel``
    (rows of ONE image shard over the mesh there).

    ``tile_parallel`` shards image ROWS over the mesh (large images);
    ``tensor_parallel`` shards layer CHANNELS over a 'model' mesh axis
    (parallel/tp.py) — multi-chip latency for images too small to tile.
    ``trusted=True`` permits the full-unpickling torch.load fallback for files
    that fail the safe weights-only path (e.g. trainer checkpoints written
    before the safe opt-state format, whose 'optax_state' pickles optax
    namedtuples).
    """
    if tile_parallel and tensor_parallel:
        raise ValueError("--tile-parallel and --tensor-parallel are exclusive: "
                         "rows OR channels shard over the devices, not both")
    if batched and tile_parallel:
        raise ValueError("batched denoising is incompatible with tile_parallel "
                         "(which shards the rows of ONE image over the mesh)")
    forward, params = build_apply(
        checkpoint, arch, base_filters, timesteps,
        channels=channels, bf16=bf16, engine=engine, trusted=trusted,
    )

    if tile_parallel:
        from ..parallel.mesh import make_mesh
        from ..parallel.tiles import denoise_large_image

        mesh = make_mesh()

        def denoise(image):
            return denoise_large_image(forward, params, image, mesh=mesh)

        return denoise

    place = None
    if tensor_parallel:
        from ..parallel.mesh import replicate
        from ..parallel.tp import make_tp_mesh, put_tp

        mesh = make_tp_mesh()
        params = put_tp(params, mesh)  # kernels channel-sharded over 'model'
        place = replicate(mesh)  # input replicated; GSPMD shards the compute

    jit_forward = jax.jit(forward)

    if batched:

        def denoise_batch(images):
            n, h, w, _ = images.shape
            hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
            x = jnp.asarray(
                np.pad(images, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                       mode="reflect")
            )
            if place is not None:
                x = jax.device_put(x, place)
            return jit_forward(params, x)[:, :h, :w]

        return denoise_batch

    def denoise(image):
        h, w, _ = image.shape
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
        x = jnp.asarray(
            np.pad(image, ((0, hp - h), (0, wp - w), (0, 0)), mode="reflect")
        )[None]
        if place is not None:
            x = jax.device_put(x, place)
        return jit_forward(params, x)[0, :h, :w]

    return denoise


def denoise_file(denoise_fn, in_path: str, out_path: str, grayscale: bool = False):
    from PIL import Image

    img = Image.open(in_path)
    img = img.convert("L") if grayscale else img.convert("RGB")
    arr = np.asarray(img, np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    x = arr.astype(np.float32) / 255.0 * 2.0 - 1.0  # Normalize(0.5, 0.5)
    y = np.asarray(denoise_fn(x))
    out = np.clip((y + 1.0) * 0.5 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(out[..., 0] if out.shape[-1] == 1 else out).save(out_path)
    return out_path


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA compile cache across runs
    p = argparse.ArgumentParser(description="Denoise images with a trained checkpoint")
    p.add_argument("--checkpoint", required=True, help=".pth (reference layout)")
    p.add_argument("--arch", default="rdunet", choices=["rdunet", "diffusion"])
    p.add_argument("--input", required=True, help="image file or folder")
    p.add_argument("--output", default=None,
                   help="output file or folder (default: <input>_denoised)")
    p.add_argument("--base-filters", type=int, default=32)
    p.add_argument("--timesteps", type=int, default=20)
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "flax", "xla", "pallas"])
    p.add_argument("--tile-parallel", action="store_true",
                   help="shard image rows across all visible devices")
    p.add_argument("--tensor-parallel", action="store_true",
                   help="shard layer channels across all visible devices "
                        "(multi-chip latency for images too small to tile)")
    p.add_argument("--trusted-checkpoint", action="store_true",
                   help="permit the full-unpickling torch.load fallback when the "
                        "safe weights-only load fails (trusted files only)")
    args = p.parse_args(argv)

    channels = 1 if args.grayscale else 3
    denoise_fn = build_denoiser(
        args.checkpoint, args.arch, args.base_filters, args.timesteps,
        channels=channels, bf16=args.bf16, engine=args.engine,
        tile_parallel=args.tile_parallel, tensor_parallel=args.tensor_parallel,
        trusted=args.trusted_checkpoint,
    )

    if os.path.isdir(args.input):
        out_dir = args.output or args.input.rstrip("/\\") + "_denoised"
        os.makedirs(out_dir, exist_ok=True)
        names = sorted(
            f for f in os.listdir(args.input)
            if f.lower().endswith(IMAGE_EXTENSIONS)
        )
        if not names:
            raise FileNotFoundError(f"no images in {args.input}")
        for name in names:
            out = denoise_file(denoise_fn, os.path.join(args.input, name),
                               os.path.join(out_dir, name), args.grayscale)
            print(out)
    else:
        out_path = args.output
        if out_path is None:
            stem, ext = os.path.splitext(args.input)
            out_path = f"{stem}_denoised{ext or '.png'}"
        print(denoise_file(denoise_fn, args.input, out_path, args.grayscale))


if __name__ == "__main__":
    main()
