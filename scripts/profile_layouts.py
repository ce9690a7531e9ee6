"""Layout + batch-sweep probes for the remaining throughput gap.

1. Narrow-channel dense pairs in NHWC vs NCHW: the HBM layout pads the minor
   (lane) dim to 128, so bf16[N,256,256,16] NHWC tensors cost 8x their logical
   bytes — does giving XLA channels on a major axis help?
2. Batch sweep of the optimized engine around the 128 saturation point.

Run from repo root: python scripts/profile_layouts.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

BATCH = 128
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


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from vub_image_denoising_tpu.models import RDUNet, rdunet_apply_fused

    key = jax.random.PRNGKey(0)
    model = RDUNet(channels=3, base_filters=BASE)
    params = jax.jit(model.init)(key, jnp.zeros((1, 256, 256, 3)))
    core = params["params"]["core"]

    def prelu(v, a, caxis):
        shape = [1, 1, 1, 1]
        shape[caxis] = -1
        aa = a.reshape(shape).astype(v.dtype)
        return jnp.maximum(v, 0) + aa * jnp.minimum(v, 0)

    def block(p, x, dn, caxis):
        h = x
        for i in range(4):
            k = p[f"conv_{i}"]["kernel"].astype(x.dtype)  # HWIO
            if dn[1] == "OIHW":
                k = k.transpose(3, 2, 0, 1)
            y = jax.lax.conv_general_dilated(h, k, (1, 1), "SAME", dimension_numbers=dn)
            shape = [1, 1, 1, 1]
            shape[caxis] = -1
            y = y + p[f"conv_{i}"]["bias"].reshape(shape).astype(x.dtype)
            y = prelu(y, p[f"actv_{i}"]["alpha"], caxis)
            if i < 3:
                h = jnp.concatenate([h, y], axis=caxis)
        return y + x

    for s in (0, 1):
        c = BASE * 2**s
        hw = 256 // 2**s
        pa, pb = core[f"block_{s}_0"], core[f"block_{s}_1"]
        flops = 0
        inner = c // 2
        for i, kt in enumerate([c, c + inner, c + 2 * inner, c + 3 * inner]):
            flops += 2 * 9 * kt * (inner if i < 3 else c)
        flops *= 2 * BATCH * hw * hw

        x_nhwc = jax.random.uniform(key, (BATCH, hw, hw, c), DTYPE)
        dn_nhwc = ("NHWC", "HWIO", "NHWC")
        f1 = jax.jit(lambda a, b, xx: block(b, block(a, xx, dn_nhwc, 3), dn_nhwc, 3))
        sec = timeit(f1, pa, pb, x_nhwc)
        print(f"s{s} pair NHWC: {sec * 1e3:7.2f} ms  {flops / sec / 1e12:6.1f} TFLOP/s",
              flush=True)

        x_nchw = jnp.array(x_nhwc.transpose(0, 3, 1, 2))
        dn_nchw = ("NCHW", "OIHW", "NCHW")
        f2 = jax.jit(lambda a, b, xx: block(b, block(a, xx, dn_nchw, 1), dn_nchw, 1))
        sec = timeit(f2, pa, pb, x_nchw)
        print(f"s{s} pair NCHW: {sec * 1e3:7.2f} ms  {flops / sec / 1e12:6.1f} TFLOP/s",
              flush=True)

    # batch sweep of the optimized engine
    fwd = jax.jit(lambda v, xx: rdunet_apply_fused(v, xx, engine="xla"))
    for batch in (96, 112, 128, 144, 160):
        try:
            x = jax.random.uniform(key, (batch, 256, 256, 3), DTYPE) * 2 - 1
            sec = timeit(fwd, params, x, iters=5)
            print(f"xla-opt batch {batch}: {sec * 1e3:7.1f} ms  "
                  f"{batch * 256 * 256 / 1e6 / sec:5.1f} MP/s", flush=True)
        except Exception as e:
            print(f"batch {batch} failed: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
