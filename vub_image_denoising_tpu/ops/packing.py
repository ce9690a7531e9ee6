"""Space-to-depth (2x2) packing for narrow-channel conv stages.

Why: on TPU the MXU computes 128x128 tiles; a conv's matmul contracts K=Cin lanes and
produces N=Cout lanes, so the RDUNet's scale-0 blocks (Cin 32..80, Cout 16/32 at
base_filters=32 — reference UNet/RDUNet_model.py:95-115) fill only a fraction of the
array (~49 TFLOP/s measured vs ~122 at scale 3, scripts/profile_scales.py).  Packing
2x2 spatial sub-pixels into channels multiplies both K and N by 4 and turns the 3x3
conv into FOUR 2x2-tap matmuls at full MXU fill, at a fixed 16/9 FLOP inflation.

The geometry (polyphase decomposition):
- EVEN packing: packed pixel (I, J) holds originals (2I+a, 2J+b), a,b in {0,1};
  channel order is sub-pixel-major: lane index = (a*2 + b) * C + c.
- SHIFTED packing: packed pixel (I, J) holds originals (2I-1+a, 2J-1+b).
- A 3x3 SAME conv maps a SHIFTED-packed input to an EVEN-packed output with a 2x2
  packed-tap kernel: output sub-pixel (2I+a) needs original rows 2I+a-1..2I+a+1,
  all inside shifted rows I..I+1.  An even tensor is re-expressed as shifted by four
  lane-group moves with flat offsets {0, 1, W, W+1} (``reshift`` below) — in the
  fused kernel these are sublane shifts, i.e. nearly free.
- The packed 2x2 kernel has structured zero blocks (dy = 2u-1+a_bar-a outside
  [-1,1]); computed densely, the four taps cost 16*K*N MACs per original pixel vs
  9*K*N — the 16/9 inflation that full MXU fill more than repays.

Everything here is traceable jnp (differentiable, jit-safe).
"""

import jax
import jax.numpy as jnp


def pack2x2(x):
    """NHWC (n, H, W, C) -> even-packed (n, H/2, W/2, 4C), lane order (a, b, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def unpack2x2(x):
    """Inverse of pack2x2: (n, Hq, Wq, 4C) -> (n, 2Hq, 2Wq, C)."""
    n, hq, wq, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, hq, wq, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * hq, 2 * wq, c)


def reshift2d(x, c):
    """Even-packed NHWC -> shifted-packed NHWC (XLA reference; the Pallas kernel does
    the same four group moves as sublane shifts).

    ``c`` is the per-sub-pixel channel count (lanes = 4c).  shifted(I,J) sub (a,b) =
    even(I-1+a', ...) — concretely: (0,0) <- even[I-1,J-1] sub (1,1); (0,1) <-
    even[I-1,J] sub (1,0); (1,0) <- even[I,J-1] sub (0,1); (1,1) <- even[I,J] sub
    (0,0).
    """
    def sh(part, dr, dc):
        if dr == 0 and dc == 0:
            return part
        return jnp.pad(part, ((0, 0), (dr, 0), (dc, 0), (0, 0)))[:, : part.shape[1], : part.shape[2], :]

    g = [x[..., i * c : (i + 1) * c] for i in range(4)]
    return jnp.concatenate(
        [sh(g[3], 1, 1), sh(g[2], 1, 0), sh(g[1], 0, 1), sh(g[0], 0, 0)], axis=-1
    )


def pack_conv3x3_weights(w, in_segments=None, shifted_order="asc"):
    """HWIO (3, 3, K, N) -> packed taps (4, 4K, 4N) for the shifted->even 2x2 conv.

    ``in_segments``: channel sizes of the parts of a lane-CONCATENATED packed input
    (each part packed separately, e.g. the dense block's [x, out0, out1, out2] or an
    upsample block's [skip, upsampled]).  The packed input index is then
    sum_of_earlier_segments*4 + (a*2+b)*seg + c.  Default: one segment of K.

    ``shifted_order``: lane-group order of the SHIFTED input the weights contract
    against — 'asc' ((abar*2+bbar)-major, reshift2d's layout) or 'desc' (the fused
    kernel's _reshift_flat layout, where lane block g holds sub-pixel 3-g).

    Tap order t = u*2 + v; output index (a*2+b)*N + n.
    W2[t][(abar,bbar,k), (a,b,n)] = w[dy+1, dx+1, k, n] with dy = 2u-1+abar-a,
    dx = 2v-1+bbar-b, zero outside [-1, 1].
    """
    k_total, n_out = w.shape[2], w.shape[3]
    if in_segments is None:
        in_segments = [k_total]
    assert sum(in_segments) == k_total
    sub_order = [(0, 0), (0, 1), (1, 0), (1, 1)]
    if shifted_order == "desc":
        sub_order = sub_order[::-1]

    taps = []
    for u in (0, 1):
        for v in (0, 1):
            seg_rows = []
            seg_start = 0
            for seg in in_segments:
                wseg = w[:, :, seg_start : seg_start + seg, :]
                z = jnp.zeros((seg, n_out), w.dtype)
                rows = []
                for abar, bbar in sub_order:
                        cols = []
                        for a in (0, 1):
                            for b in (0, 1):
                                dy = 2 * u - 1 + abar - a
                                dx = 2 * v - 1 + bbar - b
                                ok = -1 <= dy <= 1 and -1 <= dx <= 1
                                cols.append(wseg[dy + 1, dx + 1] if ok else z)
                        rows.append(jnp.concatenate(cols, axis=1))  # (seg, 4N)
                seg_rows.append(jnp.concatenate(rows, axis=0))  # (4*seg, 4N)
                seg_start += seg
            taps.append(jnp.concatenate(seg_rows, axis=0))  # (4K, 4N)
    return jnp.stack(taps)


def pack_vec(v):
    """Per-channel vector (bias / PReLU alpha) (N,) -> packed (4N,), (a,b,n)-major."""
    return jnp.tile(v, 4)


def conv3x3_packed_xla(x_even, w, bias=None):
    """XLA reference of the packed conv: even-packed input -> even-packed output.

    Equivalent to unpack -> 3x3 SAME conv -> pack (tested in tests/test_packing.py).
    Used as the oracle for the Pallas kernel and as a fallback path.
    """
    c4 = x_even.shape[-1]
    c = c4 // 4
    n, hq, wq, _ = x_even.shape
    # the shifted grid needs one extra row/col: shifted pixel Hq holds original
    # rows {2Hq-1, 2Hq} and the image's last row 2Hq-1 lives only there
    xpad = jnp.pad(x_even, ((0, 0), (0, 1), (0, 1), (0, 0)))
    xs = reshift2d(xpad, c)  # shifted-packed, (n, Hq+1, Wq+1, 4C)
    w2 = pack_conv3x3_weights(w).astype(x_even.dtype)  # (4, 4K, 4N)
    out = None
    for t, (u, v) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        # out[I,J] += shifted[I+u, J+v] @ W2[t]
        part = xs[:, u : u + hq, v : v + wq, :]
        y = jax.lax.dot_general(
            part.reshape(-1, c4), w2[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(n, hq, wq, -1)
        out = y if out is None else out + y
    if bias is not None:
        out = out + pack_vec(bias).astype(jnp.float32)
    return out.astype(x_even.dtype)
