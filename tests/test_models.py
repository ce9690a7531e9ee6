"""Model structure tests: analytic parameter counts and output shapes.

Counts derived analytically from the reference topology (SURVEY.md §6 / BASELINE.md):
- RDUNet(channels=3, base_filters=128) -> 166,375,174 params
- RDUNet(channels=3, base_filters=64)  ->  41,604,998 params
- RDUNetT(base_filters=32)             ->  10,407,142 params
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vub_image_denoising_tpu.models import RDUNet, RDUNetT


def _param_count(model, *args):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes))


@pytest.mark.parametrize(
    "base_filters,expected",
    [(128, 166_375_174), (64, 41_604_998)],
)
def test_rdunet_param_count(base_filters, expected):
    model = RDUNet(channels=3, base_filters=base_filters)
    x = jnp.zeros((1, 32, 32, 3))
    assert _param_count(model, x) == expected


def test_rdunet_t_param_count():
    model = RDUNetT(base_filters=32)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,))
    assert _param_count(model, x, t) == 10_407_142


def test_rdunet_forward_shape_and_residual():
    model = RDUNet(channels=3, base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape
    # global residual: output differs from the raw core output by exactly +x
    core = model.bind(params).core(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(core + x), rtol=1e-6)


def test_rdunet_t_forward_shape():
    model = RDUNetT(base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    t = jnp.array([0.5, 1.0])
    params = model.init(jax.random.PRNGKey(0), x, t)
    y = model.apply(params, x, t)
    assert y.shape == (2, 32, 32, 3)


def test_rdunet_t_time_conditioning_changes_output():
    model = RDUNetT(base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([0.0]))
    y0 = model.apply(params, x, jnp.array([0.0]))
    y1 = model.apply(params, x, jnp.array([1.0]))
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_bf16_forward_runs():
    model = RDUNet(channels=3, base_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x.astype(jnp.bfloat16))
    assert y.dtype == jnp.bfloat16


@pytest.mark.parametrize("remat", [True, "highres"])
def test_remat_modes_preserve_forward(remat):
    """remat=True / remat='highres' (rematerialize scale-0/1 blocks only) change
    backward memory, never forward values."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    plain = RDUNet(channels=3, base_filters=4)
    wrapped = RDUNet(channels=3, base_filters=4, remat=remat)
    variables = plain.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(wrapped.apply(variables, x)),
        np.asarray(plain.apply(variables, x)),
        rtol=1e-6, atol=1e-6,
    )
