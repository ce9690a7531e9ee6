"""Pipeline-parallel diffusion sampling (parallel/pipeline.py) on the CPU mesh.

The T-step reverse sampler is chunked over a ``stage`` axis (GPipe schedule,
microbatches handed stage-to-stage with ppermute).  Correctness bar: the
pipelined output equals ``InterpolationDiffusion.improved_sampling`` exactly
per microbatch — same op sequence, just executed on different devices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.diffusion import InterpolationDiffusion
from vub_image_denoising_tpu.models import RDUNetT
from vub_image_denoising_tpu.parallel import (
    make_pp_mesh,
    pipeline_sample_fn,
    pipelined_sampling,
)


def _setup(batch=6, timesteps=8):
    unet = RDUNetT(base_filters=4)
    noisy = jax.random.normal(jax.random.PRNGKey(0), (batch, 16, 16, 3))
    params = unet.init(jax.random.PRNGKey(1), noisy[:1], jnp.zeros((1,)))
    diff = InterpolationDiffusion(timesteps=timesteps)
    y_ref = jax.jit(
        lambda p, n: diff.improved_sampling(unet.apply, p, n)
    )(params, noisy)
    return unet, diff, params, noisy, y_ref


def test_pipelined_sampler_matches_sequential():
    """4 stages x 2 timesteps each, 3 in-flight microbatches of 2."""
    unet, diff, params, noisy, y_ref = _setup(batch=6, timesteps=8)
    mesh = make_pp_mesh(jax.devices()[:4])
    y_pp = pipelined_sampling(
        diff, unet.apply, params, noisy, mesh, microbatch=2
    )
    assert y_pp.dtype == noisy.dtype
    np.testing.assert_allclose(
        np.asarray(y_pp), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_pipelined_sampler_pads_ragged_tail():
    """B=5 with microbatch=2 -> 3 microbatches, zero-padded tail sliced off."""
    unet, diff, params, noisy, y_ref = _setup(batch=5, timesteps=8)
    mesh = make_pp_mesh(jax.devices()[:4])
    y_pp = pipelined_sampling(
        diff, unet.apply, params, noisy, mesh, microbatch=2
    )
    assert y_pp.shape == y_ref.shape
    np.testing.assert_allclose(
        np.asarray(y_pp), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_pipeline_depth_one_is_sequential():
    """S=1 degenerates to the plain sampler (no ppermute, M ticks)."""
    unet, diff, params, noisy, y_ref = _setup(batch=4, timesteps=4)
    mesh = make_pp_mesh(jax.devices()[:1])
    y_pp = pipelined_sampling(
        diff, unet.apply, params, noisy, mesh, microbatch=2
    )
    np.testing.assert_allclose(
        np.asarray(y_pp), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_pipeline_sample_fn_jits_and_revalidates():
    """The serving closure compiles once and streams successive batches."""
    unet, diff, params, noisy, y_ref = _setup(batch=4, timesteps=8)
    mesh = make_pp_mesh(jax.devices()[:8])
    fn = pipeline_sample_fn(diff, unet.apply, mesh, microbatch=2)
    y1 = fn(params, noisy)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
    # second batch reuses the compiled executable (different values, same shapes)
    noisy2 = jax.random.normal(jax.random.PRNGKey(9), noisy.shape)
    y2 = fn(params, noisy2)
    y2_ref = jax.jit(
        lambda p, n: diff.improved_sampling(unet.apply, p, n)
    )(params, noisy2)
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(y2_ref), rtol=1e-5, atol=1e-5
    )


def test_pipeline_rejects_indivisible_timesteps():
    unet, diff, params, noisy, _ = _setup(batch=2, timesteps=8)
    mesh = make_pp_mesh(jax.devices()[:3])
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_sampling(diff, unet.apply, params, noisy, mesh, microbatch=2)


def test_pipeline_composes_with_data_parallel():
    """("stage": 4, "data": 2) mesh: each in-flight microbatch's samples shard
    over "data"; ppermute streams shards stage-to-stage without gathering.
    Output must still equal the sequential sampler."""
    from vub_image_denoising_tpu.parallel.pipeline import make_ppdp_mesh

    unet, diff, params, noisy, y_ref = _setup(batch=6, timesteps=8)
    mesh = make_ppdp_mesh(4, jax.devices()[:8])
    y_pp = pipelined_sampling(
        diff, unet.apply, params, noisy, mesh, microbatch=2
    )
    np.testing.assert_allclose(
        np.asarray(y_pp), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
    with pytest.raises(ValueError, match="data axis"):
        pipelined_sampling(diff, unet.apply, params, noisy, mesh, microbatch=3)


def test_best_pipeline_depth():
    from vub_image_denoising_tpu.parallel.pipeline import best_pipeline_depth

    assert best_pipeline_depth(20, 8) == 5   # reference T=20 on an 8-chip slice
    assert best_pipeline_depth(20, 32) == 20
    assert best_pipeline_depth(8, 8) == 8
    assert best_pipeline_depth(7, 3) == 1    # prime T: no depth but 1 fits
    assert best_pipeline_depth(20, 1) == 1
