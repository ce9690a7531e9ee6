"""Pallas TPU kernel: the entire DenoisingBlock as ONE fused op.

The RDUNet's dominant compute is its residual-dense block (reference:
UNet/RDUNet_model.py:95-115): four 3x3 SAME convs with channel-concat growth, PReLU
after each, and a residual add — ~12 HLO ops per block, ~24 blocks per forward.  This
kernel fuses the whole block into a single ``pallas_call``:

- the input stays in HBM; each (batch, row-tile) program DMAs one haloed slab to VMEM;
  every intermediate (out_0..out_2) lives only in VMEM — no HBM round-trips between
  the four convs (the XLA path materializes three concatenated tensors per block);
- each conv is computed as 9 shifted MXU matmuls (one per 3x3 tap), accumulating in
  f32; the dense 'concat' is realized by accumulating per-part matmuls
  (conv(cat(a, b)) == conv_a(a) + conv_b(b)) so concatenated tensors are never built;
- intermediates are masked to zero outside the true image so the implicit zero padding
  of each nested SAME conv is bit-faithful to the reference semantics;
- PReLU and the residual add happen in-register.

Halo pyramid: TH valid output rows of conv_3 need TH+2 rows of out_2, TH+4 of out_1,
TH+6 of out_0 and TH+8 of x — hence the 4-pixel zero padding and TH+8-row slabs.

Coordinate frames (pad = 4, padded image = (H+8, W+8), true image at [4, 4+H)):
  slab for tile i = padded rows [i*TH, i*TH + TH + 8)
  out_l (l = 0,1,2) local (r, c) maps to padded (i*TH + r + l + 1, c + l + 1); it is a
  true-image sample iff i*TH + r in [3-l, H+3-l) and c in [3-l, W+3-l) — else zeroed.
  out_3 local (r, c) maps exactly to image (i*TH + r, c): no mask needed.

Numerical parity with the XLA path is covered by tests/test_fused_block.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3(parts, weights, bias, rows, cols):
    """VALID 3x3 conv over channel-stacked ``parts`` -> (rows, cols, cout) f32.

    parts: list of (rows+2, cols+2, k_p) VMEM arrays; weights: list of (3, 3, k_p,
    cout); the channel concat is realized by accumulation across parts.
    """
    cout = weights[0].shape[-1]
    acc = jnp.zeros((rows * cols, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            for part, w in zip(parts, weights):
                patch = part[dy : dy + rows, dx : dx + cols, :]
                k = patch.shape[-1]
                acc = acc + jax.lax.dot_general(
                    patch.reshape(rows * cols, k),
                    w[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    return acc.reshape(rows, cols, cout) + bias.reshape(1, 1, cout).astype(jnp.float32)


def _prelu(x, alpha):
    a = alpha.reshape(1, 1, -1).astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _mask_level(y, level, row_base, height, width):
    """Zero out_l samples outside the true image (see module docstring)."""
    rows, cols = y.shape[0], y.shape[1]
    lo = 3 - level
    # 3-D iotas avoid an i1 minor-dim reshape, which Mosaic only supports for 32-bit
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 0) + row_base
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 1)
    ok = (r >= lo) & (r < height + lo) & (c >= lo) & (c < width + lo)
    return jnp.where(ok, y, jnp.zeros_like(y))


def pad_block_params(params, cpad):
    """Zero-pad a DenoisingBlock param dict so the block operates on ``cpad``-channel
    inputs (cpad = cin rounded up to a 128 multiple — the Mosaic DMA lane-alignment
    requirement for the haloed slab copy).  Padded input lanes carry zeros: conv
    kernels' x-slices get zero cin rows, conv_3 gets zero cout columns with zero bias,
    so padded lanes produce PReLU(0)=0 and the residual add preserves the (zero) pad.
    Inner channels are untouched (they never leave VMEM)."""
    import numpy as np

    cin = params["conv_0"]["kernel"].shape[2]
    inner = params["conv_0"]["kernel"].shape[3]
    extra = cpad - cin
    if extra == 0:
        return params

    def pad_cin(k):
        return jnp.pad(k, ((0, 0), (0, 0), (0, extra), (0, 0)))

    out = {k: dict(v) for k, v in params.items()}
    # x occupies the first cin channels of every conv input slice
    out["conv_0"]["kernel"] = pad_cin(params["conv_0"]["kernel"])
    for name in ("conv_1", "conv_2", "conv_3"):
        k = params[name]["kernel"]
        x_part, rest = k[:, :, :cin, :], k[:, :, cin:, :]
        out[name]["kernel"] = jnp.concatenate(
            [jnp.pad(x_part, ((0, 0), (0, 0), (0, extra), (0, 0))), rest], axis=2
        )
    # conv_3 output widens to cpad with zero weights/bias; alpha value is irrelevant
    out["conv_3"]["kernel"] = jnp.pad(out["conv_3"]["kernel"], ((0, 0),) * 3 + ((0, extra),))
    out["conv_3"]["bias"] = jnp.pad(params["conv_3"]["bias"], (0, extra))
    out["actv_3"]["alpha"] = jnp.pad(params["actv_3"]["alpha"], (0, extra))
    return out


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_denoising_block(x, params, tile_rows=None, interpret=False):
    """Apply a DenoisingBlock (param dict of nn/blocks.py DenoisingBlock) to NHWC
    ``x`` as one Pallas kernel.  Compute dtype follows x.dtype; accumulation is f32."""
    n, h, w, cin = x.shape
    k0 = params["conv_0"]["kernel"]
    k1 = params["conv_1"]["kernel"]
    k2 = params["conv_2"]["kernel"]
    k3 = params["conv_3"]["kernel"]
    inner = k0.shape[-1]
    cout = k3.shape[-1]
    assert cout == cin, "DenoisingBlock is residual: cout == cin"
    dtype = x.dtype

    if tile_rows is None:
        # target <= ~2MB slab in VMEM: th*w*cin*2 bytes
        budget = 2 * 1024 * 1024 // max(1, (w + 8) * cin * 2)
        tile_rows = max(8, min(h, budget))
    th = min(tile_rows, h)
    while h % th:
        th -= 1

    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))

    def split(k, sizes):
        out, start = [], 0
        for s in sizes:
            out.append(jnp.asarray(k[:, :, start : start + s, :], dtype))
            start += s
        return out

    w0 = [jnp.asarray(k0, dtype)]
    w1 = split(k1, [cin, inner])
    w2 = split(k2, [cin, inner, inner])
    w3 = split(k3, [cin, inner, inner, inner])
    biases = [params[f"conv_{i}"]["bias"].reshape(1, -1) for i in range(4)]
    alphas = [params[f"actv_{i}"]["alpha"].reshape(1, -1) for i in range(4)]

    weight_args = [*w0, *w1, *w2, *w3, *biases, *alphas]
    n_w = len(weight_args)

    def kernel(x_hbm, *refs):
        weight_refs = refs[:n_w]
        out_ref = refs[n_w]
        ws = [r[:] for r in weight_refs[: 1 + 2 + 3 + 4]]
        w0k, w1k, w2k, w3k = ws[0:1], ws[1:3], ws[3:6], ws[6:10]
        bs = [r[0] for r in weight_refs[10:14]]
        as_ = [r[0] for r in weight_refs[14:18]]

        b = pl.program_id(0)
        i = pl.program_id(1)
        row_base = i * th

        def body(slab, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(row_base, th + 8)], slab, sem
            )
            dma.start()
            dma.wait()
            xs = slab[:].astype(dtype)  # (th+8, w+8, cin)

            out0 = _prelu(_conv3x3([xs], w0k, bs[0], th + 6, w + 6).astype(dtype), as_[0])
            out0 = _mask_level(out0, 0, row_base, h, w)

            out1 = _prelu(
                _conv3x3([xs[1:-1, 1:-1, :], out0], w1k, bs[1], th + 4, w + 4).astype(dtype),
                as_[1],
            )
            out1 = _mask_level(out1, 1, row_base, h, w)

            out2 = _prelu(
                _conv3x3(
                    [xs[2:-2, 2:-2, :], out0[1:-1, 1:-1, :], out1],
                    w2k, bs[2], th + 2, w + 2,
                ).astype(dtype),
                as_[2],
            )
            out2 = _mask_level(out2, 2, row_base, h, w)

            out3 = _prelu(
                _conv3x3(
                    [xs[3:-3, 3:-3, :], out0[2:-2, 2:-2, :], out1[1:-1, 1:-1, :], out2],
                    w3k, bs[3], th, w,
                ).astype(dtype),
                as_[3],
            )
            out_ref[0] = (out3 + xs[4:-4, 4:-4, :]).astype(out_ref.dtype)

        pl.run_scoped(
            body,
            slab=pltpu.VMEM((th + 8, w + 8, cin), xp.dtype),
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
