"""AOT export artifacts (eval/export.py): StableHLO roundtrip on CPU."""

import numpy as np

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.eval.export import (
    build_exported,
    load_exported,
    save_exported,
)
from vub_image_denoising_tpu.models.rdunet import RDUNet, RDUNetT
from vub_image_denoising_tpu.utils import checkpoint as ckpt_io


def _save_ckpt(tmp_path, name, model, *init_args, prefix=""):
    params = model.init(jax.random.PRNGKey(0), *init_args)
    path = str(tmp_path / name)
    ckpt_io.save_pth(path, params, epoch=1, prefix=prefix)
    return path, params


def test_export_roundtrip_matches_model_and_batch_is_symbolic(tmp_path):
    model = RDUNet(channels=3, base_filters=4)
    ck, params = _save_ckpt(tmp_path, "m.pth", model, jnp.zeros((1, 16, 16, 3)))

    exported = build_exported(ck, arch="rdunet", base_filters=4, size=16)
    path = save_exported(exported, str(tmp_path / "m.jaxexport"))
    fn = load_exported(path)

    for batch in (1, 2, 5):  # symbolic batch: one artifact, any N
        x = jax.random.normal(jax.random.PRNGKey(batch), (batch, 16, 16, 3))
        y = np.asarray(fn(x))
        want = np.asarray(jax.jit(model.apply)(params, x))
        np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)

    # artifact metadata: lowered for both platforms
    assert set(fn.exported.platforms) == {"cpu", "tpu"}


def test_export_diffusion_sampler(tmp_path):
    from vub_image_denoising_tpu.diffusion import InterpolationDiffusion

    unet = RDUNetT(base_filters=4)
    ck, params = _save_ckpt(
        tmp_path, "d.pth", unet, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
        prefix="unet.",
    )
    exported = build_exported(ck, arch="diffusion", base_filters=4,
                              timesteps=4, size=16)
    fn = load_exported(save_exported(exported, str(tmp_path / "d.jaxexport")))

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    diff = InterpolationDiffusion(timesteps=4)
    want = np.asarray(
        jax.jit(lambda p, n: diff.improved_sampling(unet.apply, p, n))(params, x)
    )
    np.testing.assert_allclose(np.asarray(fn(x)), want, rtol=1e-5, atol=1e-5)


def test_export_cli(tmp_path):
    from vub_image_denoising_tpu.eval import export as export_cli

    model = RDUNet(channels=3, base_filters=4)
    ck, _ = _save_ckpt(tmp_path, "m.pth", model, jnp.zeros((1, 16, 16, 3)))
    out = str(tmp_path / "cli.jaxexport")
    export_cli.main(["--checkpoint", ck, "--arch", "rdunet",
                     "--base-filters", "4", "--size", "16", "--out", out])
    fn = load_exported(out)
    y = fn(jnp.zeros((3, 16, 16, 3)))
    assert y.shape == (3, 16, 16, 3)


def test_export_diffusion_grayscale_raises_clearly(tmp_path):
    """The shared build_apply guard (denoise_cli.py) must fire here too: a
    clear ValueError, not an opaque conv shape error mid-trace."""
    import pytest

    unet = RDUNetT(base_filters=4)
    ck, _ = _save_ckpt(
        tmp_path, "d.pth", unet, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
        prefix="unet.",
    )
    with pytest.raises(ValueError, match="requires RGB"):
        build_exported(ck, arch="diffusion", base_filters=4, size=16,
                       channels=1)
