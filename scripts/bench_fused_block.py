"""On-TPU micro-bench: Pallas fused DenoisingBlock vs the XLA block, per scale.

Run from repo root (real TPU):  python scripts/bench_fused_block.py [c h]
Measures a dense PAIR (two chained blocks) at the bench config geometry.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

BATCH = 128


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.device_get(fn(*args)[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.device_get(y[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters


def pair_flops(c, inner, px):
    ktots = [c, c + inner, c + 2 * inner, c + 3 * inner]
    per_px = sum(2 * 9 * kt * (inner if i < 3 else c) for i, kt in enumerate(ktots))
    return 2 * per_px * px


def main():
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.models.fused_apply import _dense_block_xla
    from vub_image_denoising_tpu.ops.fused_block import fused_denoising_block

    from vub_image_denoising_tpu.ops.fused_block import (
        fused_denoising_block_packed,
        pack_block_params_packed,
    )
    from vub_image_denoising_tpu.ops.packing import pack2x2, unpack2x2

    print(f"devices: {jax.devices()}", flush=True)
    configs = [(32, 256), (64, 128), (128, 64), (256, 32)]
    if len(sys.argv) > 2:
        configs = [(int(sys.argv[1]), int(sys.argv[2]))]

    model = RDUNet(channels=3, base_filters=32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    core = params["params"]["core"]
    scale_of_c = {32: 0, 64: 1, 128: 2, 256: 3}

    for c, h in configs:
        s = scale_of_c[c]
        pa, pb = core[f"block_{s}_0"], core[f"block_{s}_1"]
        x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, h, h, c), jnp.bfloat16)
        flops = pair_flops(c, c // 2, BATCH * h * h)

        fx = jax.jit(lambda a, b, xx: _dense_block_xla(b, _dense_block_xla(a, xx)))
        sec_x = timeit(fx, pa, pb, x)
        print(f"c={c} {h}x{h}  XLA   {sec_x * 1e3:8.2f} ms  "
              f"{flops / sec_x / 1e12:6.1f} TFLOP/s", flush=True)

        y0 = fx(pa, pb, x)

        def report(kind, ff, *args):
            try:
                t0 = time.perf_counter()
                y1 = ff(*args)
                jax.device_get(y1[0, 0, 0, 0])
                print(f"  (compile {time.perf_counter() - t0:.0f}s)", flush=True)
                err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y0.astype(jnp.float32))))
                rel = err / float(jnp.max(jnp.abs(y0.astype(jnp.float32))) + 1e-9)
                sec_f = timeit(ff, *args)
                print(f"c={c} {h}x{h}  {kind} {sec_f * 1e3:8.2f} ms  "
                      f"{flops / sec_f / 1e12:6.1f} TFLOP/s  rel_err={rel:.2e}  "
                      f"({sec_x / sec_f:.2f}x vs XLA)", flush=True)
            except Exception as e:
                print(f"c={c}: {kind} failed: {type(e).__name__}: {e}", flush=True)

        if c % 128 == 0:
            for tg in [(1, 1, 1, 1), (3, 3, 3, 1), (9, 9, 9, 3)]:
                ff = jax.jit(lambda a, b, xx, tg=tg: fused_denoising_block(
                    fused_denoising_block(xx, a, tap_groups=tg), b, tap_groups=tg))
                report(f"FUSED{tg}", ff, pa, pb, x)
        if c <= 128:
            pqa, pqb = pack_block_params_packed(pa), pack_block_params_packed(pb)

            def packed(qa, qb, xx):
                q = pack2x2(xx)
                q = fused_denoising_block_packed(q, qa)
                q = fused_denoising_block_packed(q, qb)
                return unpack2x2(q)

            report("PACKED", jax.jit(packed), pqa, pqb, x)


if __name__ == "__main__":
    main()
