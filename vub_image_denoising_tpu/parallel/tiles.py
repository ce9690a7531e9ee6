"""Tile-parallel inference over megapixel images — the spatial analog of sequence
parallelism for this workload (SURVEY.md §5 'long-context').

The reference handles large images only by pre-cutting 256x256 patches on the host
(custom_dataset.py:44-58).  TPU-native alternative: shard the image's row dimension
across the mesh and run the convolutional forward under jit — XLA inserts the halo
exchanges for the 3x3 convs over ICI automatically, so a single H x W image is
denoised cooperatively by all devices with no host-side tiling or seam artifacts.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh, put_replicated


def denoise_large_image(apply_fn, params, image, mesh=None, axis="data",
                        pad_to: int = 8):
    """Denoise one (H, W, C) image with rows sharded across the mesh.

    ``apply_fn(params, batch)`` is any NHWC forward (e.g. RDUNet.apply).  The image is
    reflect-padded so H is divisible by devices*pad_to (the U-Net needs H, W divisible
    by 8 for its three downsamplings), sharded on the row axis, processed, and cropped.
    Reflect (not zero) padding matches the single-device path of the denoise CLI
    (eval/denoise_cli.py), so --tile-parallel does not change border pixels' context.

    Note: output values within the network's receptive field of the bottom/right
    borders still depend on the padded canvas extent.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    h, w, c = image.shape
    mult_h = n_dev * pad_to
    hp = -(-h // mult_h) * mult_h
    wp = -(-w // 8) * 8  # W only needs the U-Net's own divisibility (3 downsamples)
    # reflect needs pad < dim; tiny images on many devices can need more — edge
    # (replicate) is the closest fallback
    mode = "reflect" if (hp - h) < h and (wp - w) < w else "edge"
    x = jnp.pad(image, ((0, hp - h), (0, wp - w), (0, 0)), mode=mode)[None]

    params = put_replicated(params, mesh)
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
    y = jax.jit(apply_fn)(params, x)
    return y[0, :h, :w, :]
