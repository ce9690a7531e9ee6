"""Fused inference engine for RDUNet / RDUNet_T.

A pure functional forward that consumes the exact same param pytree as the flax models
(models/rdunet.py) but routes every DenoisingBlock through the Pallas mega-kernel
(ops/fused_block.py) and implements the remaining blocks with minimal-op lax calls.
This is the serving/eval hot path: on this TPU runtime each HLO op carries fixed
dispatch overhead, so collapsing the ~12 ops of each of the 24 dense blocks into one
kernel dominates the speedup; it also removes the HBM round-trips of the dense-concat
intermediates.

Training keeps the flax path (the fused kernel defines no custom VJP yet); numerical
parity between the two paths is tested in tests/test_fused_apply.py.
"""

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.fused_block import (
    fused_denoising_block,
    fused_denoising_block_packed,
    pack_block_params_packed,
    pad_block_params,
)
from ..ops.packing import pack2x2, unpack2x2

_DENSE_BLOCKS = [
    "block_0_0", "block_0_1", "block_1_0", "block_1_1", "block_2_0", "block_2_1",
    "block_3_0", "block_3_1", "block_2_2", "block_2_3", "block_1_2", "block_1_3",
    "block_0_2", "block_0_3",
]


def _cpad(c):
    return -(-c // 128) * 128


def prepare_fused_params(variables):
    """Parameter preparation hook for the fused engine.

    With the hybrid fused/XLA policy (Pallas only at 128-multiple channel counts) no
    pre-padding is required; kept as the stable API point for future weight
    transformations (e.g. pre-flattened (3, 3K, N) kernels)."""
    return variables


def _prelu(x, alpha):
    return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


def _conv3x3(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _input_block(p, x):
    x = _prelu(_conv3x3(x, p["conv_1"]), p["actv_1"]["alpha"])
    return _prelu(_conv3x3(x, p["conv_2"]), p["actv_2"]["alpha"])


def _output_block(p, x):
    x = _prelu(_conv3x3(x, p["conv_1"]), p["actv_1"]["alpha"])
    return _prelu(_conv3x3(x, p["conv_2"]), p["actv_2"]["alpha"])


def _down(p, x):
    # k2s2 conv via lax VALID stride-2: measured fastest on v5e (1.12x vs the flax
    # SAME-stride form, 1.2x vs reshape+matmul — scripts/profile_glue.py)
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["kernel"].astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _prelu(y + p["conv"]["bias"].astype(x.dtype), p["actv"]["alpha"])


def _up(p, upsample, concat):
    n, h, w, cin = upsample.shape
    k = p["conv_t"]["kernel"]
    cout = k.shape[-1]
    wk = k.transpose(2, 0, 1, 3).reshape(cin, 4 * cout).astype(upsample.dtype)
    y = (upsample @ wk).reshape(n, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)
    y = y + p["conv_t"]["bias"].astype(upsample.dtype)
    y = _prelu(y, p["actv_t"]["alpha"])
    # split the concat conv: conv(cat[skip, y]) == conv_a(skip) + conv_b(y) — skips
    # materializing the widest full-res tensor of the model (1.11x, profile_glue.py)
    wc = p["conv"]["kernel"].astype(y.dtype)
    c_skip = concat.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    ya = jax.lax.conv_general_dilated(concat, wc[:, :, :c_skip], (1, 1), "SAME",
                                      dimension_numbers=dn)
    yb = jax.lax.conv_general_dilated(y, wc[:, :, c_skip:], (1, 1), "SAME",
                                      dimension_numbers=dn)
    out = ya + yb + p["conv"]["bias"].astype(y.dtype)
    return _prelu(out, p["actv"]["alpha"])


def _dense_block_xla(params, x):
    """XLA fallback DenoisingBlock (same math as nn/blocks.py DenoisingBlock)."""
    out0 = _prelu(_conv3x3(x, params["conv_0"]), params["actv_0"]["alpha"])
    cat0 = jnp.concatenate([x, out0], axis=-1)
    out1 = _prelu(_conv3x3(cat0, params["conv_1"]), params["actv_1"]["alpha"])
    cat1 = jnp.concatenate([cat0, out1], axis=-1)
    out2 = _prelu(_conv3x3(cat1, params["conv_2"]), params["actv_2"]["alpha"])
    cat2 = jnp.concatenate([cat1, out2], axis=-1)
    out3 = _prelu(_conv3x3(cat2, params["conv_3"]), params["actv_3"]["alpha"])
    return out3 + x


def _dense_block_xla_precombined(params, x):
    """Lane-packed DenoisingBlock: identical linear algebra to ``_dense_block_xla``
    with every weight split along its input dim and regrouped by SOURCE tensor.

    The reference block (UNet/RDUNet_model.py:95-115) chains four convs whose
    output channels are the dense growth rate g = c/2 — at scale 0 that is 16
    lanes of the MXU's 128 (measured 50 TFLOP/s vs the 127 practical peak,
    BASELINE.md round 2).  Since conv_i consumes ``concat(x, out_0..out_{i-1})``,
    conv_i(cat) == sum_j conv(source_j, W_i[source_j slice]); regrouping the
    slices by source turns the four (..→g, ..→g, ..→g, ..→c) convs into four
    (c→3g+c, g→2g+c, g→g+c, g→c) convs — output lanes 80/64/48/32 instead of
    16/16/16/32 at scale 0 — at IDENTICAL total FLOPs, and eliminates all three
    channel-concat materializations (each stage reads one source tensor).
    Summation order differs from the reference, so use on compute-dtype (bf16)
    paths; parity vs the reference block is tested to f32 tolerance.
    """
    c = x.shape[-1]
    k = [params[f"conv_{i}"]["kernel"].astype(x.dtype) for i in range(4)]
    b = [params[f"conv_{i}"]["bias"].astype(x.dtype) for i in range(4)]
    al = [params[f"actv_{i}"]["alpha"] for i in range(4)]
    g = k[0].shape[-1]

    # weights regrouped by source tensor (HWIO: input channels on axis 2)
    w_x = jnp.concatenate([k[0], k[1][:, :, :c], k[2][:, :, :c], k[3][:, :, :c]], -1)
    w_0 = jnp.concatenate([k[1][:, :, c:], k[2][:, :, c:c + g], k[3][:, :, c:c + g]], -1)
    w_1 = jnp.concatenate([k[2][:, :, c + g:], k[3][:, :, c + g:c + 2 * g]], -1)
    w_2 = k[3][:, :, c + 2 * g:]

    def conv(h, w):
        return jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    a = conv(x, w_x)                      # [g | g | g | c] contributions of x
    out0 = _prelu(a[..., :g] + b[0], al[0])
    bb = conv(out0, w_0)                  # [g | g | c] contributions of out0
    out1 = _prelu(a[..., g:2 * g] + bb[..., :g] + b[1], al[1])
    cc = conv(out1, w_1)                  # [g | c] contributions of out1
    out2 = _prelu(a[..., 2 * g:3 * g] + bb[..., g:2 * g] + cc[..., :g] + b[2], al[2])
    dd = conv(out2, w_2)                  # [c] contributions of out2
    out3 = _prelu(a[..., 3 * g:] + bb[..., 2 * g:] + cc[..., g:] + dd + b[3], al[3])
    return out3 + x


def _fused_block_semantic(x, params, tile_rows=None, interpret=False, packed=False):
    """One DenoisingBlock on unpacked NHWC x via the chosen Pallas kernel."""
    if packed:
        pq = pack_block_params_packed(params)
        return unpack2x2(
            fused_denoising_block_packed(pack2x2(x), pq, tile_rows=tile_rows,
                                         interpret=interpret)
        )
    return fused_denoising_block(x, params, tile_rows=tile_rows, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_block_trainable(x, params, tile_rows=None, interpret=False, packed=False):
    """Differentiable fused DenoisingBlock: Pallas forward, XLA-VJP backward.

    The backward recomputes the XLA-path block and pulls gradients through it
    (rematerialization-style — pallas_call has no autodiff).  Both paths compute
    the same math, so grads match the pure-XLA step to compute-dtype tolerance
    (tests/test_fused_apply.py).  Lets the trainers opt into the fused forward.
    """
    return _fused_block_semantic(x, params, tile_rows, interpret, packed)


def _fused_block_fwd(x, params, tile_rows, interpret, packed):
    return _fused_block_semantic(x, params, tile_rows, interpret, packed), (x, params)


def _fused_block_bwd(tile_rows, interpret, packed, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda xx, pp: _dense_block_xla(pp, xx), x, params)
    dx, dparams = vjp(g)
    return dx, dparams


fused_block_trainable.defvjp(_fused_block_fwd, _fused_block_bwd)


# Channel threshold for the lane-packed (precombined) dense block on the XLA
# engine.  ISOLATED pairs at batch 128 win (scripts/profile_precombined.py, v5e:
# c=32 0.88x, c=64 1.23x, c=128 1.05x, c=256 1.11x) but MODEL-LEVEL it regresses
# (bench.py: off 64.4, c>=256 64.0, c>=128 57.9, c>=64 55.9 MP/s) — the
# sliced-lane adds break XLA's producer-consumer fusion with the glue convs.
# Default off; env VUB_PRECOMBINE_MIN_C enables for re-probing (BASELINE.md).
import os as _os

_PRECOMBINE_MIN_CHANNELS = int(_os.environ.get("VUB_PRECOMBINE_MIN_C", str(1 << 30)))


@jax.custom_vjp
def _dense_block_precombined_bwd(params, x):
    """DenoisingBlock with the STANDARD forward but the lane-packed BACKWARD.

    The precombined forward loses model-level throughput because its sliced-lane
    adds break XLA's fusion with neighboring glue convs (see note above) — but
    its BACKWARD has wider MXU lanes: the weight-grad convs contract over
    regrouped (3g+c / 2g+c / g+c / c)-wide outputs instead of four g-wide ones,
    and the data-grads flow through four per-source convs instead of
    concat-split chains.  Since both formulations compute the same function,
    pulling the cotangent through the precombined graph yields the same
    gradients (up to float reassociation) with better-shaped matmuls.
    Measured on v5e (scripts/profile_bwd.py) before adoption.
    """
    return _dense_block_xla(params, x)


def _dense_block_precombined_bwd_fwd(params, x):
    return _dense_block_xla(params, x), (params, x)


def _dense_block_precombined_bwd_bwd(res, g):
    params, x = res
    _, vjp = jax.vjp(_dense_block_xla_precombined, params, x)
    return vjp(g)


_dense_block_precombined_bwd.defvjp(
    _dense_block_precombined_bwd_fwd, _dense_block_precombined_bwd_bwd
)


def _down_s2d(p, x):
    """k2s2 downsample as space-to-depth + matmul (identical math to _down).

    Forward measured SLOWER than the VALID-s2 conv emitter (profile_glue.py),
    but its VJP is two matmuls + reshapes — no conv-transpose dgrad emitter.
    Used as the backward graph of ``_down_fast_bwd``.
    """
    n, h, w, cin = x.shape
    k = p["conv"]["kernel"]  # (2, 2, cin, cout)
    cout = k.shape[-1]
    xs = x.reshape(n, h // 2, 2, w // 2, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // 2, w // 2, 4 * cin)
    wk = k.reshape(4 * cin, cout).astype(x.dtype)
    y = xs @ wk + p["conv"]["bias"].astype(x.dtype)
    return _prelu(y, p["actv"]["alpha"])


@jax.custom_vjp
def _down_fast_bwd(p, x):
    """Downsample: VALID-s2 conv forward (fastest emitter), matmul backward."""
    return _down(p, x)


def _down_fast_bwd_fwd(p, x):
    return _down(p, x), (p, x)


def _down_fast_bwd_bwd(res, g):
    p, x = res
    _, vjp = jax.vjp(_down_s2d, p, x)
    return vjp(g)


_down_fast_bwd.defvjp(_down_fast_bwd_fwd, _down_fast_bwd_bwd)


# Backward-path experiment knobs — both MEASURED-NEGATIVE on v5e, default off
# (scripts/profile_bwd.py, RDUNet-128 batch 8 256^2 bf16, round 3):
#   baseline (remat=False)            246.4 ms/step  2.13 MP/s
#   VUB_DOWN_MATMUL_BWD=1             249.5 ms       (-1%: conv-transpose dgrad
#                                     already fine; the matmul VJP only reshuffles)
#   VUB_BWD_PRECOMBINE=128            315.5 ms       (-22%: the lane-packed bwd
#                                     breaks XLA fusion exactly like its forward)
# The per-component profile shows why: dense-block BACKWARD already runs at
# 122-181 TF/s (HIGHER per-FLOP than the 80-124 TF/s forward), so restructured
# backward graphs have nothing to win.  The real round-2 gap was remat recompute:
# at the flagship batch 8 activations fit HBM, and remat=False is 1.26x.
_BWD_PRECOMBINE_MIN_C = int(_os.environ.get("VUB_BWD_PRECOMBINE", str(1 << 30)))
_DOWN_MATMUL_BWD = _os.environ.get("VUB_DOWN_MATMUL_BWD", "0") == "1"


def _core(p: Dict[str, Any], x, tile_rows=None, interpret=False, engine="auto",
          trainable=False, remat=False):
    down = _down_fast_bwd if _DOWN_MATMUL_BWD else _down

    def block_for(c):
        if c >= _PRECOMBINE_MIN_CHANNELS:
            fn = _dense_block_xla_precombined
        elif c >= _BWD_PRECOMBINE_MIN_C:
            fn = _dense_block_precombined_bwd
        else:
            fn = _dense_block_xla
        return jax.checkpoint(fn) if remat else fn

    def dense_pair(name_a, name_b, h):
        """Two dense blocks.  Engine choice (measured on v5e, scripts/bench_fused_block
        + profile_xla_opts):
        - 'xla': XLA convs.  At the saturating batch XLA's conv emitters run at
          50-125 TFLOP/s per scale — at/near this chip's PRACTICAL matmul peak
          (~127 TFLOP/s, not the 197 nominal) for the wide scales — and beat every
          hand-written Mosaic variant.  This is the throughput path.
        - 'pallas': the fused mega-kernel where the DMA lane rule allows it
          (c % 128 == 0 and weights resident in VMEM).  Wins in the SMALL-BATCH
          latency regime (fewer dispatches, no HBM round-trips): the SIDD sampler
          at batch 8 measured ~10% faster end-to-end.
        - 'auto': pallas when the per-call pixel count is in the latency regime,
          xla otherwise."""
        c = h.shape[-1]
        inner = p[name_a]["conv_0"]["kernel"].shape[-1]
        ktots = [c, c + inner, c + 2 * inner, c + 3 * inner]
        weight_bytes = sum(9 * kt * (inner if i < 3 else c) * 2
                           for i, kt in enumerate(ktots))
        if engine == "auto":
            latency_regime = x.shape[0] * x.shape[1] * x.shape[2] <= (1 << 21)
            eng = "pallas" if latency_regime else "xla"
        else:
            eng = engine
        use_fused = interpret or (
            eng == "pallas" and c % 128 == 0 and weight_bytes <= (4 << 20)
        )
        if not use_fused:
            block_xla = block_for(c)
            return block_xla(p[name_b], block_xla(p[name_a], h))
        if trainable:
            h = fused_block_trainable(h, p[name_a], tile_rows, interpret, False)
            return fused_block_trainable(h, p[name_b], tile_rows, interpret, False)
        h = fused_denoising_block(h, p[name_a], tile_rows=tile_rows, interpret=interpret)
        h = fused_denoising_block(h, p[name_b], tile_rows=tile_rows, interpret=interpret)
        return h

    out0 = _input_block(p["input_block"], x)
    out0 = dense_pair("block_0_0", "block_0_1", out0)

    out1 = down(p["down_0"], out0)
    out1 = dense_pair("block_1_0", "block_1_1", out1)

    out2 = down(p["down_1"], out1)
    out2 = dense_pair("block_2_0", "block_2_1", out2)

    out3 = down(p["down_2"], out2)
    out3 = dense_pair("block_3_0", "block_3_1", out3)

    out4 = _up(p["up_2"], out3, out2)
    out4 = dense_pair("block_2_2", "block_2_3", out4)

    out5 = _up(p["up_1"], out4, out1)
    out5 = dense_pair("block_1_2", "block_1_3", out5)

    out6 = _up(p["up_0"], out5, out0)
    out6 = dense_pair("block_0_2", "block_0_3", out6)

    return _output_block(p["output_block"], out6)


def rdunet_apply_fused(variables, x, tile_rows=None, interpret=False, engine="auto",
                       trainable=False, remat=False):
    """Drop-in replacement for RDUNet.apply on the same variables pytree.

    ``trainable=True`` routes fused blocks through the custom-VJP wrapper so the
    whole forward is differentiable (backward = XLA-path VJP); pass as the
    trainer's ``apply_fn`` to train with the fused forward.  ``remat=True``
    rematerializes the XLA dense blocks in backward (HBM relief).
    """
    p = variables["params"]["core"] if "core" in variables.get("params", {}) else variables["core"]
    return _core(p, x, tile_rows, interpret, engine, trainable, remat) + x


def rdunet_t_apply_fused(variables, x, t, tile_rows=None, interpret=False, engine="auto",
                         trainable=False, remat=False):
    """Drop-in replacement for RDUNetT.apply (time-conditioned).

    engine='xla' is natively differentiable (plain XLA ops); engine='pallas' needs
    ``trainable=True`` to route blocks through the custom-VJP wrapper.
    """
    p = variables["params"]["core"] if "core" in variables.get("params", {}) else variables["core"]
    n, h, w, _ = x.shape
    t = jnp.asarray(t, x.dtype)
    if t.ndim <= 1:
        t_plane = jnp.broadcast_to(t.reshape(-1, 1, 1, 1), (n, h, w, 1))
    else:
        t_plane = jnp.broadcast_to(t.astype(x.dtype), (n, h, w, 1))
    xt = jnp.concatenate([x, t_plane], axis=-1)
    return _core(p, xt, tile_rows, interpret, engine, trainable, remat) + x
