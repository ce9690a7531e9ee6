"""Tile-parallel large-image inference + TensorBoard grid helper."""

import numpy as np

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.models import RDUNet
from vub_image_denoising_tpu.parallel import make_mesh
from vub_image_denoising_tpu.parallel.tiles import denoise_large_image
from vub_image_denoising_tpu.utils.tb import make_grid


def test_denoise_large_image_matches_single_device():
    model = RDUNet(channels=3, base_filters=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    img = jax.random.normal(jax.random.PRNGKey(1), (100, 70, 3)) * 0.2

    got = np.asarray(denoise_large_image(model.apply, params, img, mesh=make_mesh()))
    assert got.shape == (100, 70, 3)

    # single-device reference on the SAME padded geometry (8 devices x pad_to=8 pads
    # H to 128, so the 1-device run must use pad_to=64 — the U-Net's output depends
    # on the padded canvas near borders)
    ref = np.asarray(
        denoise_large_image(
            model.apply, params, img, mesh=make_mesh(jax.devices()[:1]), pad_to=64
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_make_grid_layout():
    imgs = np.zeros((5, 4, 4, 3), np.float32)
    imgs[0, :, :, 0] = 1.0
    grid = make_grid(imgs, nrow=4, padding=2)
    # 2 rows x 4 cols of 4x4 cells with 2px padding
    assert grid.shape == (2 * 6 + 2, 4 * 6 + 2, 3)
    # first cell holds image 0 (red)
    np.testing.assert_allclose(grid[2:6, 2:6, 0], 1.0)
    np.testing.assert_allclose(grid[2:6, 2:6, 1], 0.0)
    # padding stays zero
    np.testing.assert_allclose(grid[0, :, :], 0.0)


def test_log_activations_captures_feature_maps():
    """The hooks-equivalent (flax capture_intermediates) writes one channel-mean
    heat map grid per submodule (reference: paper_gan.py:292-309)."""
    from vub_image_denoising_tpu.models.rca_gan import Generator
    from vub_image_denoising_tpu.utils.tb import log_activations

    class Recorder:
        def __init__(self):
            self.tags = []

        def add_image(self, tag, img, step, dataformats=None):
            assert img.ndim == 3 and np.isfinite(img).all()
            self.tags.append(tag)

    gen = Generator(in_channels=1, out_channels=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 1))
    variables = gen.init(jax.random.PRNGKey(1), x, train=False)
    rec = Recorder()
    tags = log_activations(rec, gen.apply, variables, x, train=False)
    assert tags and tags == rec.tags
    assert all(t.startswith("debug/") for t in tags)
