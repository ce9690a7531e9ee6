"""Pallas TPU kernels: the entire DenoisingBlock as ONE fused op.

The RDUNet's dominant compute is its residual-dense block (reference:
UNet/RDUNet_model.py:95-115): four 3x3 SAME convs with channel-concat growth, PReLU
after each, and a residual add — ~12 HLO ops per block, ~24 blocks per forward.  These
kernels fuse the whole block into a single ``pallas_call``, which matters twice on
TPU: intermediates (out_0..out_2) never round-trip HBM, and on this runtime every HLO
op carries fixed dispatch overhead, so 12 ops -> 1 is a direct win.

Kernel geometry — everything is 2-D ``(rows*Wp, K)`` so every Mosaic op is
layout-native (lanes = channels, sublanes = flattened row-major pixels):

- grid = (batch, H/TH); each program consumes one haloed slab (TH+8 rows, zero-padded
  input, pad=4), DMA'd HBM->VMEM with cross-grid double buffering (program i starts
  program i+1's copy before waiting on its own, hiding the DMA latency that otherwise
  serializes the grid).  The DMA requires the channel (lane) dim to be a multiple of
  128 — met natively at c>=128, and via space-to-depth packing below it.
- all levels keep the FULL padded width Wp = W+8; flattened row-major, a column shift
  by +-1 is a sublane shift whose cross-row carries land on the zero-padding columns.
- taps are stacked along the matmul's output dim in host-side-prepared weights
  (``_stack_taps``): one (M, K) @ (K, g*N) matmul per tap group + g sublane-shifted
  slice-adds, so narrow-N convs still fill the MXU's 128 output lanes.  The group
  size g in {1, 3, 9} is chosen per conv from N (g*N ~ 128..576); g=1 recovers the
  plain per-tap matmul when N is already wide.
- the halo pyramid (TH+8 -> TH+6 -> ... -> TH rows) is made of Wp-aligned flat
  slices; the dense-concat inputs are lane concatenations.
- out-of-image samples are zeroed by iota masks (flat index -> row, col), making the
  nested SAME-conv zero padding bit-faithful to the reference semantics.
- accumulation in f32; PReLU and the residual add in-register.

``fused_denoising_block_packed`` additionally runs the whole block in a 2x2
space-to-depth packed layout (ops/packing.py) for the narrow scales: K and N
quadruple, the 3x3 conv becomes 4 packed taps (2x2), and the DMA lane rule is met at
c=32/64.  FLOP inflation is a fixed 16/9, repaid ~4x by MXU fill.

Numerical parity with the XLA path: tests/test_fused_block.py and tests/test_packing.py
(interpret mode) plus the on-TPU checks in bench.py.
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


def _tap_group(n):
    """Tap-stacking group size: make g*N land in the MXU's happy zone."""
    if n >= 128:
        return 1
    if n >= 43:
        return 3
    return 9


def _stack_taps(w, group):
    """HWIO (3, 3, K, N) -> list of (K, group*N) stacked-tap weights (row-major taps).

    Host-side prep: Mosaic cannot reshape (K, 9, N)->(K, 9N) in-kernel.
    """
    k, n = w.shape[2], w.shape[3]
    flat = w.reshape(9, k, n)
    return [
        flat[s : s + group].transpose(1, 0, 2).reshape(k, group * n)
        for s in range(0, 9, group)
    ]


def _conv3x3_flat(parts, wstacks, n, group, bias, rows_out, wp):
    """3x3 conv in flattened fixed-width frame from pre-stacked tap weights.

    parts: list of 2-D (rows_in*wp, k_p) values (rows_in = rows_out + 2).
    wstacks: list of (K, group*n).  Returns (rows_out*wp, n) f32.
    out[j] = sum_taps y[j + dy*wp + dx - 1, tap]; the zero rows added around each
    group's matmul output reproduce the zero fill of a shifted frame exactly.
    """
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    m = rows_out * wp
    acc = jnp.zeros((m, n), jnp.float32)
    zeros = jnp.zeros((1, group * n), jnp.float32)
    for gi, ws in enumerate(wstacks):
        y = jax.lax.dot_general(
            x, ws, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        y = jnp.concatenate([zeros, y, zeros], axis=0)
        for j in range(group):
            t = gi * group + j
            dy, dx = t // 3, t % 3
            acc = acc + y[dy * wp + dx : dy * wp + dx + m, j * n : (j + 1) * n]
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


def _double_buffered_slab(x_hbm, slab, sem, row_stride, rows_per_tile):
    """Start this tile's DMA (if first), prefetch the next tile's, wait for ours.

    Grid is (batch, H/TH), iterated row-major and sequentially per core; the 2-slot
    ``slab``/``sem`` scratch persists across grid steps, so program ``lin`` can kick
    off program ``lin+1``'s HBM->VMEM copy before blocking on its own — the copy for
    step i+1 overlaps step i's compute.
    Returns the VMEM ref holding this tile's slab.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    n_total = pl.num_programs(0) * n_i
    lin = b * n_i + i

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * row_stride, rows_per_tile)], slab.at[slot], sem.at[slot]
        )

    @pl.when(lin == 0)
    def _():
        dma(0, b, i).start()

    nxt = lin + 1

    @pl.when(nxt < n_total)
    def _():
        dma(nxt % 2, nxt // n_i, nxt % n_i).start()

    dma(lin % 2, b, i).wait()
    return slab.at[lin % 2]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret", "tap_groups"))
def fused_denoising_block(x, params, tile_rows=None, interpret=False, tap_groups=None):
    """Apply a DenoisingBlock (param dict of nn/blocks.py DenoisingBlock) to NHWC
    ``x`` as one Pallas kernel.  On real TPU, x's channel count must be a multiple of
    128 (use the packed variant below, or pad_block_params + zero channel padding).
    Compute dtype follows x.dtype; accumulation is f32.
    ``tap_groups``: optional static (g0..g3) override of the per-conv tap-stacking
    group sizes (1, 3 or 9)."""
    n, h, w, cin = x.shape
    k0 = params["conv_0"]["kernel"]
    cout = params["conv_3"]["kernel"].shape[-1]
    assert cout == cin, "DenoisingBlock is residual: cout == cin"
    dtype = x.dtype
    wp = w + 8

    inner = k0.shape[-1]
    if tap_groups is not None:
        tap_groups = tuple(tap_groups)  # jit-static: lists are unhashable
        assert len(tap_groups) == 4 and all(g in (1, 3, 9) for g in tap_groups), (
            f"tap_groups must be 4 values from {{1,3,9}}, got {tap_groups}"
        )
    groups = list(tap_groups) if tap_groups else [_tap_group(inner)] * 3 + [_tap_group(cout)]
    if tile_rows is None:
        # VMEM budget: fixed costs (conv weights resident in VMEM) plus a per-row
        # footprint — double-buffered slab, widest concat input, the tap-stacked f32
        # y (group*N wide, one group live at a time), f32 accumulator/residual,
        # the three kept intermediates.  Mosaic's stacked scoped allocation runs
        # ~1.6-2x naive estimates, so target 8MB of the 16MB VMEM.  Buffers whose
        # dtype follows x.dtype are costed at its itemsize (f32 inputs double them).
        es = jnp.dtype(dtype).itemsize
        ktots = [cin, cin + inner, cin + 2 * inner, cin + 3 * inner]
        weight_bytes = sum(9 * kt * (inner if i < 3 else cin) * es
                           for i, kt in enumerate(ktots))
        ymax = max(g * (inner if i < 3 else cout) for i, g in enumerate(groups))
        bytes_per_row = wp * (
            2 * es * cin + es * max(ktots) + 4 * ymax + 8 * cin + 3 * es * inner
        )
        avail = (8 << 20) - weight_bytes
        tile_rows = max(4, avail // max(1, bytes_per_row))
    th = min(tile_rows, h)
    while h % th:
        th -= 1

    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))

    wstacks = [
        [s.astype(dtype) for s in _stack_taps(params[f"conv_{i}"]["kernel"], groups[i])]
        for i in range(4)
    ]
    n_stacks = [len(s) for s in wstacks]
    weight_args = [s for stacks in wstacks for s in stacks]
    weight_args += [params[f"conv_{i}"]["bias"].reshape(1, -1) for i in range(4)]
    weight_args += [params[f"actv_{i}"]["alpha"].reshape(1, -1) for i in range(4)]
    n_w = len(weight_args)

    def kernel(x_hbm, *refs):
        wr = refs[:n_w]
        out_ref = refs[n_w]
        slab, sem = refs[n_w + 1], refs[n_w + 2]
        ws, pos = [], 0
        for cnt in n_stacks:
            ws.append([wr[pos + j][:] for j in range(cnt)])
            pos += cnt
        bs = [wr[pos + i][0] for i in range(4)]
        as_ = [wr[pos + 4 + i][0] for i in range(4)]

        i = pl.program_id(1)
        row_base = i * th
        tile = _double_buffered_slab(x_hbm, slab, sem, th, th + 8)
        xs = tile[:].astype(dtype).reshape((th + 8) * wp, cin)

        def level(parts, wi, nw, bias, alpha, rows_out, lvl):
            o = _conv3x3_flat(parts, ws[wi], nw, groups[wi], bias, rows_out, wp)
            o = _prelu(o.astype(dtype), alpha)
            if lvl is not None:
                o = _mask_flat(o, lvl, row_base, h, w, wp)
            return o

        o0 = level([xs], 0, inner, bs[0], as_[0], th + 6, 0)
        o1 = level([xs[wp : wp + (th + 6) * wp], o0], 1, inner, bs[1], as_[1], th + 4, 1)
        o2 = level(
            [xs[2 * wp : 2 * wp + (th + 4) * wp], o0[wp : wp + (th + 4) * wp], o1],
            2, inner, bs[2], as_[2], th + 2, 2,
        )
        o3 = level(
            [
                xs[3 * wp : 3 * wp + (th + 2) * wp],
                o0[2 * wp : 2 * wp + (th + 2) * wp],
                o1[wp : wp + (th + 2) * wp],
                o2,
            ],
            3, cout, bs[3], as_[3], th, None,
        )
        full = o3 + xs[4 * wp : 4 * wp + th * wp]
        out_ref[0] = full.reshape(th, wp, cin)[:, 4 : 4 + w, :].astype(out_ref.dtype)

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
        scratch_shapes=[
            pltpu.VMEM((2, th + 8, wp, cin), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, *weight_args)


# ---------------------------------------------------------------------------
# space-to-depth packed variant (narrow-channel scales)
# ---------------------------------------------------------------------------

def _reshift_flat(p2d, c, wqp):
    """Even-packed -> DESCENDING-order shifted-packed in the flattened frame.

    p2d: (rows*wqp, 4c) even-packed part, lane order (a, b, c).  Output lane block g
    holds shifted sub-pixel (a,b) with a*2+b = 3-g, which is sourced from even lane
    block g itself at sublane offset [0, 1, wqp, wqp+1][g] — i.e. NO lane movement,
    only per-group sublane shifts.  Mosaic chokes on lane-sliced sublane-concats
    (offset layouts), so this is built from FOUR full-width shifted copies merged by
    a lane-group select; every op is full-width and layout-aligned.  The matching
    weight layout is pack_conv3x3_weights(..., shifted_order='desc').
    """
    group = jax.lax.broadcasted_iota(jnp.int32, p2d.shape, 1) // c
    out = p2d  # group 0: offset 0
    for g, off in ((1, 1), (2, wqp), (3, wqp + 1)):
        out = jnp.where(group == g, _shift_rows(p2d, off), out)
    return out


def _conv2x2_packed_flat(parts, part_subch, w2stack, bias4, rows_out, wqp):
    """Packed shifted->even conv: 2x2 taps, tap-stacked into ONE matmul.

    parts: list of EVEN-packed 2-D (rows_in*wqp, 4*c_p) values, rows_in = rows_out+2
    (output row I needs shifted rows I..I+1, shifted row I needs even rows I-1..I,
    so the caller passes even arrays starting one row above the first output row).
    part_subch: per-part per-sub-pixel channel counts c_p.  w2stack: (4K, 4*4N)
    tap-stacked packed weights (ops/packing.py pack_conv3x3_weights, taps on the
    output dim).  Returns (rows_out*wqp, 4N) f32 even-packed.
    """
    shifted = [_reshift_flat(p, c, wqp) for p, c in zip(parts, part_subch)]
    x = shifted[0] if len(shifted) == 1 else jnp.concatenate(shifted, axis=-1)
    n4 = w2stack.shape[1] // 4
    m = rows_out * wqp
    y4 = jax.lax.dot_general(
        x, w2stack, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y4 = jnp.concatenate([y4, jnp.zeros((1, 4 * n4), jnp.float32)], axis=0)
    acc = jnp.zeros((m, n4), jnp.float32)
    for t, (u, v) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        # out[j] += y4[j + wqp + u*wqp + v, tap t]: the +wqp skips the row consumed
        # by the reshift (even row I-1), then taps select shifted rows I+u.
        off = wqp + u * wqp + v
        acc = acc + y4[off : off + m, t * n4 : (t + 1) * n4]
    return acc + bias4.reshape(1, n4).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_denoising_block_packed(xq, packed_params, tile_rows=None, interpret=False):
    """DenoisingBlock on an EVEN-packed input (ops/packing.py pack2x2) as one Pallas
    kernel: 2x2-tap packed convs at full MXU fill (K=4*Cin, N(tap-stacked)=16*Cout).

    This is the scale-0/1 path: at base_filters=32 those blocks' raw channel counts
    (32/64) underfill MXU lanes AND violate the Mosaic DMA lane-alignment rule;
    packed they become 128/256 lanes.  FLOP inflation is a fixed 16/9 (structured
    zero blocks in the packed taps), repaid ~4x by the fill.

    ``xq``: (n, Hq, Wq, 4C).  ``packed_params``: from pack_block_params_packed().
    """
    n, hq, wq, c4 = xq.shape
    c = c4 // 4
    dtype = xq.dtype
    wqp = wq + 8

    w0, w1, w2, w3 = (packed_params[f"conv_{i}"]["kernel"] for i in range(4))
    inner4 = w0.shape[1] // 4  # = 4*inner
    if tile_rows is None:
        es = jnp.dtype(dtype).itemsize
        ktot4 = w3.shape[0]  # 4*(c + 3*inner)
        weight_bytes = sum(w.size * es for w in (w0, w1, w2, w3))
        # double-buffered slab + shifted concat copy + 16N-wide f32 y4 + f32 acc
        # + intermediates (dtype-following buffers costed at x.dtype's itemsize)
        bytes_per_row = wqp * (
            2 * es * c4 + es * ktot4 + 16 * max(inner4, c4) + 8 * c4 + 3 * es * inner4
        )
        avail = (8 << 20) - weight_bytes
        tile_rows = max(2, avail // max(1, bytes_per_row))
    tq = min(tile_rows, hq)
    while hq % tq:
        tq -= 1

    xp = jnp.pad(xq, ((0, 0), (4, 4), (4, 4), (0, 0)))

    weight_args = [w.astype(dtype) for w in (w0, w1, w2, w3)]
    weight_args += [packed_params[f"conv_{i}"]["bias"].reshape(1, -1) for i in range(4)]
    weight_args += [packed_params[f"actv_{i}"]["alpha"].reshape(1, -1) for i in range(4)]
    n_w = len(weight_args)

    def kernel(x_hbm, *refs):
        wr = refs[:n_w]
        out_ref = refs[n_w]
        slab, sem = refs[n_w + 1], refs[n_w + 2]
        ws = [wr[i][:] for i in range(4)]
        bs = [wr[4 + i][0] for i in range(4)]
        as_ = [wr[8 + i][0] for i in range(4)]

        i = pl.program_id(1)
        row_base = i * tq
        tile = _double_buffered_slab(x_hbm, slab, sem, tq, tq + 8)
        xs = tile[:].astype(dtype).reshape((tq + 8) * wqp, c4)

        def level(parts, subch, w_, bias, alpha, rows_out, lvl):
            o = _conv2x2_packed_flat(parts, subch, w_, bias, rows_out, wqp)
            o = _prelu(o.astype(dtype), alpha)
            if lvl is not None:
                o = _mask_flat(o, lvl, row_base, hq, wq, wqp)
            return o

        # conv_i output (even) spans tile rows [i+1, tq+7-i); each conv's parts
        # are sliced starting one row ABOVE its output range (for the reshift).
        o0 = level([xs], [c], ws[0], bs[0], as_[0], tq + 6, 0)
        o1 = level(
            [xs[1 * wqp : 1 * wqp + (tq + 6) * wqp], o0],
            [c, inner4 // 4], ws[1], bs[1], as_[1], tq + 4, 1,
        )
        o2 = level(
            [
                xs[2 * wqp : 2 * wqp + (tq + 4) * wqp],
                o0[1 * wqp : 1 * wqp + (tq + 4) * wqp],
                o1,
            ],
            [c, inner4 // 4, inner4 // 4], ws[2], bs[2], as_[2], tq + 2, 2,
        )
        o3 = level(
            [
                xs[3 * wqp : 3 * wqp + (tq + 2) * wqp],
                o0[2 * wqp : 2 * wqp + (tq + 2) * wqp],
                o1[1 * wqp : 1 * wqp + (tq + 2) * wqp],
                o2,
            ],
            [c, inner4 // 4, inner4 // 4, inner4 // 4],
            ws[3], bs[3], as_[3], tq, None,
        )
        full = o3 + xs[4 * wqp : 4 * wqp + tq * wqp]
        out_ref[0] = full.reshape(tq, wqp, c4)[:, 4 : 4 + wq, :].astype(out_ref.dtype)

    grid = (n, hq // tq)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ] * n_w
    out_spec = pl.BlockSpec(
        (1, tq, wq, c4), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, hq, wq, c4), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tq + 8, wqp, c4), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, *weight_args)


def pack_block_params_packed(params):
    """Transform a DenoisingBlock param dict (nn/blocks.py) into the packed-kernel
    form: tap-stacked packed conv kernels (4K, 16N) and 4x-tiled bias/alpha."""
    from .packing import pack_conv3x3_weights, pack_vec

    cin = params["conv_0"]["kernel"].shape[2]
    inner = params["conv_0"]["kernel"].shape[3]
    segs = [[cin], [cin, inner], [cin, inner, inner], [cin, inner, inner, inner]]
    out = {}
    for i in range(4):
        w2 = pack_conv3x3_weights(
            params[f"conv_{i}"]["kernel"], in_segments=segs[i], shifted_order="desc"
        )
        t, k4, n4 = w2.shape
        out[f"conv_{i}"] = {
            "kernel": w2.transpose(1, 0, 2).reshape(k4, t * n4),
            "bias": pack_vec(params[f"conv_{i}"]["bias"]),
        }
        out[f"actv_{i}"] = {"alpha": pack_vec(params[f"actv_{i}"]["alpha"])}
    return out
