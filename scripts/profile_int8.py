"""Is int8 a real lever on this chip?  Measurement gate for a quantized engine.

The v5e MXU's nominal int8 rate is 2x bf16 (394 vs 197 TOPS).  The bf16
inference path is already at its measured practical ceiling (BASELINE.md:
64.4 MP/s at 74% practical MFU; seven measured-negative scheduling
experiments), so datatype is the one untried axis.  Before building any
quantized engine, this probe answers three questions on real hardware:

 1. raw int8 dot_general rate vs bf16 (does XLA hit the int8 MXU path at all?)
 2. int8 conv rate at the model's hot shapes (dense-pair convs, batch 128)
 3. end-to-end quantized dense pair INCLUDING the quantize/dequantize glue
    (per-channel weight scales, per-tensor activation scales) — the number an
    engine would actually see

plus a hardware-free accuracy figure: PSNR of a per-channel-int8 RDUNet
forward vs the f32 forward on random data (runs on CPU too).

Run from the repo root on real TPU:  python scripts/profile_int8.py
CPU numerics only:  JAX_PLATFORMS=cpu python scripts/profile_int8.py --numerics

Decision rule (same as profile_scales/profile_bwd): an engine is only worth
building if probe 3 sustains >= 1.5x the bf16 dense-pair rate; otherwise this
file's output is the measured-negative writeup.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
SIZE = 64  # scale-2-ish working size at batch 128 fits HBM comfortably


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        y = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def report(name, sec, ops):
    rate = ops / sec / 1e12
    print(f"{name:52s} {sec * 1e3:9.2f} ms   {rate:7.2f} T(FL)OP/s", flush=True)
    return rate


# ---------------------------------------------------------------- quant utils
def quant_weight_per_channel(w):
    """HWIO f32 -> (int8, per-O scale).  Symmetric max-abs."""
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quant_act_per_tensor(x, scale):
    """bf16/f32 -> int8 with a precomputed (calibrated) per-tensor scale."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def conv_int8(xq, wq, x_scale, w_scale):
    """int8 x int8 -> int32 conv, dequantized to bf16."""
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (x_scale * w_scale)).astype(jnp.bfloat16)


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


# ---------------------------------------------------------------- probes
def probe_dot(n=8192):
    ops = 2 * n**3
    a8 = jnp.ones((n, n), jnp.int8)
    b8 = jnp.ones((n, n), jnp.int8)
    dot8 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    r8 = report(f"dot {n}^3 int8->int32", timeit(dot8, a8, b8), ops)

    ab = jnp.ones((n, n), jnp.bfloat16)
    bb = jnp.ones((n, n), jnp.bfloat16)
    dotb = jax.jit(lambda a, b: a @ b)
    rb = report(f"dot {n}^3 bf16", timeit(dotb, ab, bb), ops)
    print(f"  -> int8/bf16 speedup: {r8 / rb:.2f}x", flush=True)


def probe_conv(c):
    px = BATCH * SIZE * SIZE
    ops = 2 * 9 * c * c * px
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, SIZE, SIZE, c), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, c, c), jnp.float32) * 0.05

    rb = report(f"conv3x3 {c}->{c} bf16", timeit(jax.jit(conv_bf16), x, w.astype(jnp.bfloat16)), ops)

    wq, ws = quant_weight_per_channel(w)
    xq = quant_act_per_tensor(x.astype(jnp.float32), 0.05)
    r8 = report(f"conv3x3 {c}->{c} int8 (pre-quantized)",
                timeit(jax.jit(conv_int8), xq, wq, jnp.float32(0.05), ws), ops)

    # end-to-end: quantize the activation inside the step (what an engine pays)
    def pair_e2e(x, wq1, ws1, wq2, ws2):
        s1 = jnp.float32(0.05)
        y = conv_int8(quant_act_per_tensor(x.astype(jnp.float32), s1), wq1, s1, ws1)
        s2 = jnp.float32(0.05)
        return conv_int8(quant_act_per_tensor(y.astype(jnp.float32), s2), wq2, s2, ws2)

    def pair_bf16(x, w1, w2):
        return conv_bf16(conv_bf16(x, w1), w2)

    rp8 = report(f"conv-pair {c} int8 e2e (quant inside)",
                 timeit(jax.jit(pair_e2e), x, wq, ws, wq, ws), 2 * ops)
    rpb = report(f"conv-pair {c} bf16",
                 timeit(jax.jit(pair_bf16), x, w.astype(jnp.bfloat16),
                        w.astype(jnp.bfloat16)), 2 * ops)
    print(f"  -> pair int8/bf16 speedup: {rp8 / rpb:.2f}x", flush=True)


def numerics():
    """PSNR of the per-channel-int8-quantized RDUNet forward vs f32 (CPU-safe)."""
    from vub_image_denoising_tpu.models import RDUNet

    model = RDUNet(channels=3, base_filters=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 64, 64, 3)) * 2 - 1
    params = model.init(jax.random.PRNGKey(1), x[:1])
    y_ref = jax.jit(model.apply)(params, x)

    # weight-only int8: quantize every conv kernel per-channel, dequantize, run
    def wq_leaf(path, leaf):
        name = jax.tree_util.keystr(path)
        if leaf.ndim == 4 and "kernel" in name:
            q, s = quant_weight_per_channel(leaf)
            return q.astype(jnp.float32) * s
        return leaf

    params_q = jax.tree_util.tree_map_with_path(wq_leaf, params)
    y_q = jax.jit(model.apply)(params_q, x)
    err = jnp.mean((y_q - y_ref) ** 2)
    psnr = float(10 * jnp.log10(4.0 / jnp.maximum(err, 1e-20)))  # range 2
    print(f"weight-only int8 RDUNet forward vs f32: PSNR {psnr:.1f} dB "
          f"(>= 55 dB means weight quant is a non-issue; activation quant is "
          f"the accuracy question an engine must calibrate)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--numerics", action="store_true", help="CPU-safe accuracy check only")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    numerics()
    if args.numerics:
        return
    probe_dot()
    for c in (64, 128, 256):
        probe_conv(c)


if __name__ == "__main__":
    main()
