"""Pallas TPU kernel: the entire DenoisingBlock as ONE fused op.

The RDUNet's dominant compute is its residual-dense block (reference:
UNet/RDUNet_model.py:95-115): four 3x3 SAME convs with channel-concat growth, PReLU
after each, and a residual add — ~12 HLO ops per block, ~24 blocks per forward.  This
kernel fuses the whole block into a single ``pallas_call``, which matters twice on
TPU: intermediates (out_0..out_2) never round-trip HBM, and on this runtime every HLO
op carries fixed dispatch overhead, so 12 ops -> 1 is a direct win.

Kernel geometry — everything is 2-D ``(rows*Wp, K)`` so every Mosaic op is
layout-native (lanes = channels, sublanes = flattened row-major pixels):

- grid = (batch, H/TH); each program DMAs one haloed slab (TH+8 rows, zero-padded
  input, pad=4) from HBM to VMEM.  The DMA requires the channel (lane) dim to be a
  multiple of 128 — ``pad_block_params`` + caller-side channel padding arrange that
  (zero-weight pad lanes ride through the residual untouched).
- all levels keep the FULL padded width Wp = W+8; flattened row-major, a column shift
  by +-1 is a sublane shift of the 2-D array whose cross-row carries land on the
  zero-padding columns — the 3x3 conv becomes 9 MXU matmuls over (dy row-slice,
  dx shifted copy) with the full concat-channel contraction; only ONE shifted copy is
  live at a time, bounding VMEM.
- the dy taps and the halo pyramid (TH+8 -> TH+6 -> ... -> TH rows) are Wp-aligned
  flat slices; the dense-concat inputs are lane concatenations.
- out-of-image samples are zeroed by iota masks (flat index -> row, col), making the
  nested SAME-conv zero padding bit-faithful to the reference semantics.
- accumulation in f32; PReLU and the residual add in-register.

Numerical parity with the XLA path: tests/test_fused_block.py (interpret mode) and
the on-TPU checks in bench.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_rows(x2d, shift):
    """Shift a 2-D (M, K) array along sublanes, filling with zeros.

    shift=+1: out[p] = x[p-1] (out[0] = 0); shift=-1: out[p] = x[p+1] (out[M-1] = 0).
    Implemented as slice+concat (Mosaic's rotate doesn't support 16-bit data); the
    zero fill lands on padded columns, so it is equivalent to the wrap of a roll over
    the zero-padded frame.
    """
    k = x2d.shape[1]
    zeros = jnp.zeros((abs(shift), k), x2d.dtype)
    if shift > 0:
        return jnp.concatenate([zeros, x2d[:-shift]], axis=0)
    return jnp.concatenate([x2d[-shift:], zeros], axis=0)


def _conv3x3_flat(parts, w, bias, rows_out, wp):
    """3x3 conv in flattened fixed-width frame.

    parts: list of 2-D (rows_in*wp, k_p) values (rows_in = rows_out + 2).  w: HWIO
    (3, 3, K, N), K = sum k_p.  Returns (rows_out*wp, N) f32.  One shifted copy is
    live at a time (dx loop) to bound VMEM; the dy taps are wp-aligned flat slices.
    """
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    n = w.shape[-1]
    m = rows_out * wp
    acc = jnp.zeros((m, n), jnp.float32)
    for dx in range(3):
        xs = x if dx == 1 else _shift_rows(x, 1 - dx)
        for dy in range(3):
            acc = acc + jax.lax.dot_general(
                xs[dy * wp : dy * wp + m],
                w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc + bias.reshape(1, n).astype(jnp.float32)


def _prelu(x, alpha):
    a = alpha.reshape(1, -1).astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _mask_flat(y, level, row_base, height, width, wp, pad=4):
    """Zero samples outside the true image.

    ``y`` is (rows*wp, C) at halo level ``level`` (0..2): flat index f is local
    (row r = f // wp, col p = f % wp); valid iff row_base + r in [3-level,
    H+3-level) and p in [pad, pad+W).
    """
    m = y.shape[0]
    lo = 3 - level
    f = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    r = f // wp + row_base
    p = f - (f // wp) * wp
    ok = (r >= lo) & (r < height + lo) & (p >= pad) & (p < pad + width)
    return jnp.where(ok, y, jnp.zeros_like(y))


def _reshape_w(k, dtype):
    """Kernel weights stay HWIO (3, 3, K, N); just cast to the compute dtype."""
    return k.astype(dtype)


def pad_block_params(params, cpad):
    """Zero-pad a DenoisingBlock param dict so the block operates on ``cpad``-channel
    inputs (cpad = cin rounded up to a 128 multiple — the Mosaic DMA lane-alignment
    requirement for the haloed slab copy).  Padded input lanes carry zeros: conv
    kernels' x-slices get zero cin rows, conv_3 gets zero cout columns with zero bias,
    so padded lanes produce PReLU(0)=0 and the residual add preserves the (zero) pad.
    Inner channels are untouched (they never leave VMEM)."""
    cin = params["conv_0"]["kernel"].shape[2]
    extra = cpad - cin
    if extra == 0:
        return params

    out = {k: dict(v) for k, v in params.items()}
    out["conv_0"]["kernel"] = jnp.pad(
        params["conv_0"]["kernel"], ((0, 0), (0, 0), (0, extra), (0, 0))
    )
    for name in ("conv_1", "conv_2", "conv_3"):
        k = params[name]["kernel"]
        x_part, rest = k[:, :, :cin, :], k[:, :, cin:, :]
        out[name]["kernel"] = jnp.concatenate(
            [jnp.pad(x_part, ((0, 0), (0, 0), (0, extra), (0, 0))), rest], axis=2
        )
    out["conv_3"]["kernel"] = jnp.pad(out["conv_3"]["kernel"], ((0, 0),) * 3 + ((0, extra),))
    out["conv_3"]["bias"] = jnp.pad(params["conv_3"]["bias"], (0, extra))
    out["actv_3"]["alpha"] = jnp.pad(params["actv_3"]["alpha"], (0, extra))
    return out


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_denoising_block(x, params, tile_rows=None, interpret=False):
    """Apply a DenoisingBlock (param dict of nn/blocks.py DenoisingBlock) to NHWC
    ``x`` as one Pallas kernel.  On real TPU, x's channel count must be a multiple of
    128 (use pad_block_params + zero channel padding).  Compute dtype follows x.dtype;
    accumulation is f32."""
    n, h, w, cin = x.shape
    k0 = params["conv_0"]["kernel"]
    cout = params["conv_3"]["kernel"].shape[-1]
    assert cout == cin, "DenoisingBlock is residual: cout == cin"
    dtype = x.dtype
    wp = w + 8

    inner = k0.shape[-1]
    if tile_rows is None:
        # VMEM budget: fixed costs (the four conv weights, resident in VMEM) plus a
        # per-row footprint — slab, the four tap-concat buffers (3x the concat
        # channels each), intermediates, f32 accumulator/residual, double-buffered
        # output.  Mosaic stacks scoped allocations, so stay well under 16MB.
        ktots = [cin, cin + inner, cin + 2 * inner, cin + 3 * inner]
        weight_bytes = sum(9 * kt * (inner if i < 3 else cin) * 2
                           for i, kt in enumerate(ktots))
        bytes_per_row = wp * 2 * (cin + 2 * max(ktots) + sum(ktots) // 2 + 3 * inner + 4 * cin)
        # empirical: Mosaic's stacked scoped allocation runs ~1.6x this estimate,
        # so target 8MB to stay under the 16MB VMEM limit
        avail = (8 << 20) - weight_bytes
        tile_rows = max(4, avail // max(1, bytes_per_row))
    th = min(tile_rows, h)
    while h % th:
        th -= 1

    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))

    w0 = _reshape_w(k0, dtype)
    w1 = _reshape_w(params["conv_1"]["kernel"], dtype)
    w2 = _reshape_w(params["conv_2"]["kernel"], dtype)
    w3 = _reshape_w(params["conv_3"]["kernel"], dtype)
    biases = [params[f"conv_{i}"]["bias"].reshape(1, -1) for i in range(4)]
    alphas = [params[f"actv_{i}"]["alpha"].reshape(1, -1) for i in range(4)]
    weight_args = [w0, w1, w2, w3, *biases, *alphas]
    n_w = len(weight_args)

    def kernel(x_hbm, *refs):
        wr = refs[:n_w]
        out_ref = refs[n_w]
        w0r, w1r, w2r, w3r = (wr[i][:] for i in range(4))
        bs = [wr[4 + i][0] for i in range(4)]
        as_ = [wr[8 + i][0] for i in range(4)]

        b = pl.program_id(0)
        i = pl.program_id(1)
        row_base = i * th

        def body(slab, sem):
            dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(row_base, th + 8)], slab, sem)
            dma.start()
            dma.wait()
            xs = slab[:].astype(dtype).reshape((th + 8) * wp, cin)

            def level(parts, w2r_, bias, alpha, rows_out, lvl):
                o = _conv3x3_flat(parts, w2r_, bias, rows_out, wp)
                o = _prelu(o.astype(dtype), alpha)
                if lvl is not None:
                    o = _mask_flat(o, lvl, row_base, h, w, wp)
                return o

            o0 = level([xs], w0r, bs[0], as_[0], th + 6, 0)
            o1 = level([xs[wp : wp + (th + 6) * wp], o0], w1r, bs[1], as_[1], th + 4, 1)
            o2 = level(
                [xs[2 * wp : 2 * wp + (th + 4) * wp], o0[wp : wp + (th + 4) * wp], o1],
                w2r, bs[2], as_[2], th + 2, 2,
            )
            o3 = level(
                [
                    xs[3 * wp : 3 * wp + (th + 2) * wp],
                    o0[2 * wp : 2 * wp + (th + 2) * wp],
                    o1[wp : wp + (th + 2) * wp],
                    o2,
                ],
                w3r, bs[3], as_[3], th, None,
            )
            full = o3 + xs[4 * wp : 4 * wp + th * wp]
            out_ref[0] = full.reshape(th, wp, cin)[:, 4 : 4 + w, :].astype(out_ref.dtype)

        pl.run_scoped(
            body,
            slab=pltpu.VMEM((th + 8, wp, cin), xp.dtype),
            sem=pltpu.SemaphoreType.DMA,
        )

    grid = (n, h // th)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ] * n_w
    out_spec = pl.BlockSpec(
        (1, th, w, cout), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), dtype),
        interpret=interpret,
    )(xp, *weight_args)
