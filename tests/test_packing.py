"""Space-to-depth packing + packed fused DenoisingBlock: numerical parity tests.

Oracle chain: lax 3x3 SAME conv == conv3x3_packed_xla (packed-weight math) ==
fused_denoising_block_packed in interpret mode (kernel geometry: reshift sublane
shifts, tap-stacked matmul, halo pyramid, masks)."""

import numpy as np

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.models.fused_apply import _dense_block_xla
from vub_image_denoising_tpu.nn.blocks import DenoisingBlock
from vub_image_denoising_tpu.ops.fused_block import (
    fused_denoising_block_packed,
    pack_block_params_packed,
)
from vub_image_denoising_tpu.ops.packing import (
    conv3x3_packed_xla,
    pack2x2,
    pack_conv3x3_weights,
    reshift2d,
    unpack2x2,
)


def test_pack_unpack_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 10, 3), jnp.float32)
    q = pack2x2(x)
    assert q.shape == (2, 4, 5, 12)
    np.testing.assert_array_equal(np.asarray(unpack2x2(q)), np.asarray(x))


def test_packed_conv_matches_lax_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 16, 6), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 6, 5).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(5).astype(np.float32))

    y_ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b

    yq = conv3x3_packed_xla(pack2x2(x), w, bias=b)
    y = unpack2x2(yq)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def test_packed_conv_multi_segment_weights():
    """Concatenating two separately-packed tensors on lanes + segment-aware packed
    weights == conv of the original concat."""
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    c = jnp.asarray(rng.randn(1, 8, 8, 6), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 10, 7).astype(np.float32) * 0.2)

    y_ref = jax.lax.conv_general_dilated(
        jnp.concatenate([a, c], -1), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )

    w2 = pack_conv3x3_weights(w, in_segments=[4, 6]).astype(jnp.float32)

    def shifted(t, cc):
        q = jnp.pad(pack2x2(t), ((0, 0), (0, 1), (0, 1), (0, 0)))
        return reshift2d(q, cc)

    xs = jnp.concatenate([shifted(a, 4), shifted(c, 6)], -1)
    n, hq, wq = a.shape[0], a.shape[1] // 2, a.shape[2] // 2
    out = None
    for t, (u, v) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        part = xs[:, u : u + hq, v : v + wq, :]
        yt = (part.reshape(-1, xs.shape[-1]) @ w2[t]).reshape(n, hq, wq, -1)
        out = yt if out is None else out + yt
    y = unpack2x2(out)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def _block_params(c, inner, key):
    mod = DenoisingBlock(c, inner, c)
    return mod.init(key, jnp.zeros((1, 8, 8, c)))["params"]


def test_fused_packed_block_matches_xla_block():
    c, inner = 8, 4
    p = _block_params(c, inner, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, c), jnp.float32)

    y_ref = _dense_block_xla(p, x)
    pq = pack_block_params_packed(p)
    yq = fused_denoising_block_packed(pack2x2(x), pq, interpret=True)
    y = unpack2x2(yq)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-4)


def test_fused_packed_block_multi_tile():
    """Multiple row tiles exercise the halo DMA + masks."""
    c, inner = 8, 4
    p = _block_params(c, inner, jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(4).randn(1, 32, 16, c), jnp.float32)

    y_ref = _dense_block_xla(p, x)
    pq = pack_block_params_packed(p)
    yq = fused_denoising_block_packed(pack2x2(x), pq, tile_rows=4, interpret=True)
    y = unpack2x2(yq)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
