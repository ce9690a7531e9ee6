"""Where does RDUNet inference time go on this TPU? Per-scale + per-strategy timing.

Times, at the bench config (base_filters=32, batch 128, 256x256, bf16):
 1. each scale's dense-block pair as a standalone jit (XLA path),
 2. the glue blocks (input/down/up/output),
 3. the full model,
 4. a conv-strategy shootout for the narrow-Cout scales (the MXU-underfill problem,
    BASELINE.md: a 32->16 conv runs at ~3 TFLOP/s vs the ~45 TFLOP/s wide-conv ceiling):
    - lax.conv (what XLA does today)
    - tap-stacked matmul: one (M, K) @ (K, 9*N) matmul + 9 shifted adds -> the MXU
      sees N_eff = 9*Cout lanes instead of Cout
    - im2col: patches on K (K = 9*Cin, N = Cout)

Run from the repo root on real TPU: python scripts/profile_scales.py
(All timings force completion with device_get; see CLAUDE.md on the axon runtime.)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
SIZE = 256
BASE = 32
DTYPE = jnp.bfloat16


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        y = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def report(name, sec, flops):
    tf = flops / sec / 1e12
    print(f"{name:48s} {sec * 1e3:9.2f} ms   {tf:7.2f} TFLOP/s", flush=True)
    return tf


def dense_pair_flops(c, inner, px):
    ktots = [c, c + inner, c + 2 * inner, c + 3 * inner]
    per_px = sum(2 * 9 * kt * (inner if i < 3 else c) for i, kt in enumerate(ktots))
    return 2 * per_px * px  # two blocks


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.models.fused_apply import (
        _dense_block_xla, _down, _input_block, _output_block, _up,
    )

    model = RDUNet(channels=3, base_filters=BASE)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, jnp.zeros((1, SIZE, SIZE, 3)))
    core = params["params"]["core"]
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), DTYPE) * 2 - 1

    npx = BATCH * SIZE * SIZE

    # --- full model
    fwd = jax.jit(model.apply)
    sec = timeit(fwd, params, x)
    total_flops = 0
    f0 = BASE
    for s in range(4):
        c, inner, px = f0 * 2**s, (f0 * 2**s) // 2, npx // 4**s
        nblocks = 2 if s == 3 else 4
        total_flops += dense_pair_flops(c, inner, px) * nblocks / 2
    # glue: input 3->32,32->32; output 32->32,32->3; downs k2s2; ups
    total_flops += 2 * 9 * npx * (3 * f0 + f0 * f0) * 2  # input+output approx
    mfu_base = sec
    print(f"\nfull model: {sec * 1e3:.2f} ms  -> {npx / 1e6 / sec:.1f} MP/s, "
          f"~{total_flops / sec / 1e12:.1f} TFLOP/s effective\n", flush=True)

    # --- per-scale dense pairs
    scale_secs = []
    for s in range(4):
        c, inner = f0 * 2**s, (f0 * 2**s) // 2
        h = SIZE // 2**s
        xs = jax.random.uniform(key, (BATCH, h, h, c), DTYPE)
        pa, pb = core[f"block_{s}_0"], core[f"block_{s}_1"]
        f = jax.jit(lambda a, b, xx: _dense_block_xla(b, _dense_block_xla(a, xx)))
        sec = timeit(f, pa, pb, xs)
        scale_secs.append(sec)
        report(f"scale {s} dense pair (c={c}, {h}x{h})", sec,
               dense_pair_flops(c, inner, BATCH * h * h))

    n_pairs = [2, 2, 2, 1]  # pairs per scale in the full model
    est = sum(sec * n for sec, n in zip(scale_secs, n_pairs))
    print(f"\nsum of dense pairs in model: {est * 1e3:.2f} ms "
          f"({est / mfu_base * 100:.0f}% of full model)\n", flush=True)

    # --- glue blocks
    x0 = jax.random.uniform(key, (BATCH, SIZE, SIZE, f0), DTYPE)
    report("input block (3->32->32)", timeit(jax.jit(_input_block), core["input_block"], x),
           2 * 9 * npx * (3 * f0 + f0 * f0))
    report("output block", timeit(jax.jit(_output_block), core["output_block"], x0),
           2 * 9 * npx * (f0 * f0 + f0 * 3))
    report("down_0 (32->64 k2s2)", timeit(jax.jit(_down), core["down_0"], x0),
           2 * 4 * (npx // 4) * f0 * 2 * f0)
    x1 = jax.random.uniform(key, (BATCH, SIZE // 2, SIZE // 2, 2 * f0), DTYPE)
    report("up_0 (64->32 + concat conv)", timeit(jax.jit(_up), core["up_0"], x1, x0),
           2 * npx * (f0 * 2 * f0 + 9 * 2 * f0 * f0))

    # --- conv strategy shootout (scales 0 and 1, conv_0 shape: c -> c/2)
    print("\n--- conv strategies ---", flush=True)
    for s in (0, 1):
        c, inner = f0 * 2**s, (f0 * 2**s) // 2
        h = SIZE // 2**s
        px = BATCH * h * h
        xs = jax.random.uniform(key, (BATCH, h, h, c), DTYPE)
        w = jax.random.normal(key, (3, 3, c, inner), DTYPE) * 0.05
        flops = 2 * 9 * c * inner * px

        def conv_lax(xx, ww):
            return jax.lax.conv_general_dilated(
                xx, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv_tapstack(xx, ww):
            # one matmul with N = 9*inner, then shift-add the taps
            n_, h_, w_, c_ = xx.shape
            wflat = ww.transpose(2, 0, 1, 3).reshape(c_, 9 * ww.shape[-1])
            y9 = xx @ wflat  # (n, h, w, 9*inner)
            y9 = y9.reshape(n_, h_, w_, 9, ww.shape[-1])
            out = jnp.zeros((n_, h_, w_, ww.shape[-1]), xx.dtype)
            for dy in range(3):
                for dx in range(3):
                    tap = y9[:, :, :, dy * 3 + dx, :]
                    # output[p] += tap[p - (dy-1), q - (dx-1)] with zero pad
                    tap = jnp.pad(tap, ((0, 0), (1, 1), (1, 1), (0, 0)))[
                        :, 2 - dy : 2 - dy + h_, 2 - dx : 2 - dx + w_, :]
                    out = out + tap
            return out

        def conv_im2col(xx, ww):
            n_, h_, w_, c_ = xx.shape
            patches = jax.lax.conv_general_dilated_patches(
                xx, (3, 3), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # patches channels are ordered (c, kh, kw) -> match by reordering w
            wmat = ww.transpose(2, 0, 1, 3).reshape(9 * c_, ww.shape[-1])
            return patches @ wmat

        y0 = jax.jit(conv_lax)(xs, w)
        for name, f in (("lax.conv", conv_lax), ("tapstack", conv_tapstack),
                        ("im2col", conv_im2col)):
            jf = jax.jit(f)
            y = jf(xs, w)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y0.astype(jnp.float32))))
            sec = timeit(jf, xs, w)
            tf = flops / sec / 1e12
            print(f"  s{s} conv {c}->{inner} {name:10s} {sec * 1e3:8.2f} ms "
                  f"{tf:7.2f} TFLOP/s  err={err:.2e}", flush=True)

        # whole dense block with tap-stacked convs
        def prelu(v, a):
            return jnp.maximum(v, 0) + a.astype(v.dtype) * jnp.minimum(v, 0)

        def dense_tapstack(p, xx):
            hcat = xx
            outs = []
            for i in range(4):
                pi = p[f"conv_{i}"]
                y = conv_tapstack(hcat, pi["kernel"].astype(xx.dtype))
                y = prelu(y + pi["bias"].astype(xx.dtype), p[f"actv_{i}"]["alpha"])
                if i < 3:
                    hcat = jnp.concatenate([hcat, y], axis=-1)
                    outs.append(y)
            return y + xx

        pa, pb = core[f"block_{s}_0"], core[f"block_{s}_1"]
        f2 = jax.jit(lambda a, b, xx: dense_tapstack(b, dense_tapstack(a, xx)))
        fx = jax.jit(lambda a, b, xx: _dense_block_xla(b, _dense_block_xla(a, xx)))
        yref = fx(pa, pb, xs)
        ytap = f2(pa, pb, xs)
        err = float(jnp.max(jnp.abs(ytap.astype(jnp.float32) - yref.astype(jnp.float32))))
        sec = timeit(f2, pa, pb, xs)
        report(f"  s{s} dense pair TAPSTACK (err={err:.1e})", sec,
               dense_pair_flops(c, inner, px))


if __name__ == "__main__":
    main()
