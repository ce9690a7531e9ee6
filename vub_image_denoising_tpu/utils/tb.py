"""TensorBoard logging helpers.

The reference logs scalar streams and per-epoch image grids via
``torchvision.utils.make_grid`` + SummaryWriter (diffusion_RDUnet.py:131,152-159;
RDUNet_model.py:226-244) and auto-launches tensorboard as a subprocess (:195-200).
torchvision is not available here, so ``make_grid`` is reimplemented for NHWC numpy
arrays; the writer comes from tensorboardX (installed) with a no-op fallback.
"""

import subprocess
from typing import Optional

import numpy as np


def make_grid(images, nrow: int = 4, padding: int = 2, normalize: bool = False):
    """NHWC [0,1] batch -> one HWC grid image (torchvision.utils.make_grid semantics:
    row-major placement, ``nrow`` images per row, zero padding between cells)."""
    images = np.asarray(images, np.float32)
    if images.ndim == 3:
        images = images[None]
    n, h, w, c = images.shape
    if normalize:
        lo, hi = images.min(), images.max()
        images = (images - lo) / max(hi - lo, 1e-12)
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    grid = np.zeros(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c), np.float32
    )
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y0 = r * (h + padding) + padding
        x0 = col * (w + padding) + padding
        grid[y0 : y0 + h, x0 : x0 + w] = images[idx]
    return grid


def create_writer(log_dir: str):
    """SummaryWriter (tensorboardX) or a print-only fallback."""
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir=log_dir)
    except ImportError:
        class _Null:
            def add_scalar(self, tag, value, step):
                print(f"[tb] {tag}={value} step={step}")

            def add_image(self, *a, **k):
                pass

            def flush(self):
                pass

            def close(self):
                pass

        return _Null()


def add_image_grid(writer, tag: str, images, step: int, nrow: int = 4,
                   normalize: bool = True):
    """Log an NHWC batch as one grid (reference logs CHW; tensorboardX wants HWC via
    dataformats)."""
    grid = make_grid(images, nrow=nrow, normalize=normalize)
    writer.add_image(tag, grid, step, dataformats="HWC")


def start_tensorboard(log_dir: str):
    """Best-effort tensorboard subprocess launch (diffusion_RDUnet.py:195-200)."""
    try:
        subprocess.Popen(["tensorboard", "--logdir", log_dir])
        print("TensorBoard started at http://localhost:6006")
    except Exception as e:
        print(f"Failed to start TensorBoard: {e}")


def log_activations(writer, apply_fn, variables, batch, step: int = 0,
                    tag_prefix: str = "debug", max_layers: int = 32,
                    **apply_kwargs):
    """Activation-map visualization for any flax model.

    The reference registers forward hooks on every conv-owning submodule of the
    RCA-GAN generator and writes each activation to a ``/debug`` SummaryWriter
    (paper_gan.py:292-309 ``visualize_activation``/``register_hooks``).  Hooks
    don't exist under jit, so the TPU-native equivalent is one un-jitted forward
    with flax's ``capture_intermediates``: every submodule's output is captured
    functionally, reduced to a channel-mean heat map, and logged as an image
    grid.  Returns the list of tags written.
    """
    out = apply_fn(
        variables, batch, capture_intermediates=True,
        mutable=["intermediates"], **apply_kwargs,
    )
    intermediates = out[1]["intermediates"] if isinstance(out, tuple) else {}

    tags = []

    def visit(tree, path):
        if len(tags) >= max_layers:
            return
        if isinstance(tree, dict):
            for k in sorted(tree):
                visit(tree[k], path + (k,))
            return
        leaves = tree if isinstance(tree, (tuple, list)) else (tree,)
        for leaf in leaves:
            arr = np.asarray(leaf, np.float32)
            if arr.ndim != 4:  # NHWC feature maps only
                continue
            heat = arr.mean(axis=-1, keepdims=True)  # channel-mean map per sample
            tag = f"{tag_prefix}/" + "/".join(p for p in path if p != "__call__")
            add_image_grid(writer, tag, heat, step, normalize=True)
            tags.append(tag)
            break
    visit(intermediates, ())
    return tags
