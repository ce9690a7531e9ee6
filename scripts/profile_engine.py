"""Breakdown of the optimized XLA engine (the 64.4 MP/s path): where is the
remaining time vs the ~87 MP/s practical-peak roofline?

Times each stage of models/fused_apply.py's engine='xla' forward standalone at the
bench config, plus a couple of remaining-candidate variants.

Run from repo root: python scripts/profile_engine.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

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


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.models import fused_apply as fa

    model = RDUNet(channels=3, base_filters=BASE)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, jnp.zeros((1, SIZE, SIZE, 3)))
    core = params["params"]["core"]
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), DTYPE) * 2 - 1

    full = jax.jit(lambda v, xx: fa.rdunet_apply_fused(v, xx, engine="xla"))
    sec = timeit(full, params, x)
    print(f"xla-opt full: {sec * 1e3:7.1f} ms  {BATCH * SIZE * SIZE / 1e6 / sec:5.1f} MP/s",
          flush=True)

    flax_fwd = jax.jit(model.apply)
    sec = timeit(flax_fwd, params, x)
    print(f"flax    full: {sec * 1e3:7.1f} ms  {BATCH * SIZE * SIZE / 1e6 / sec:5.1f} MP/s",
          flush=True)

    # stage-by-stage of the xla engine
    stages = []
    x0 = jax.random.uniform(key, (BATCH, SIZE, SIZE, BASE), DTYPE)
    x1 = jax.random.uniform(key, (BATCH, 128, 128, 2 * BASE), DTYPE)
    x2 = jax.random.uniform(key, (BATCH, 64, 64, 4 * BASE), DTYPE)
    x3 = jax.random.uniform(key, (BATCH, 32, 32, 8 * BASE), DTYPE)

    def pair(s):
        a, b = core[f"block_{s}_0"], core[f"block_{s}_1"]
        return jax.jit(lambda xx, a=a, b=b: fa._dense_block_xla(b, fa._dense_block_xla(a, xx)))

    stages.append(("input", timeit(jax.jit(fa._input_block), core["input_block"], x)))
    stages.append(("s0 pair x2", 2 * timeit(pair(0), x0)))
    stages.append(("down_0", timeit(jax.jit(fa._down), core["down_0"], x0)))
    stages.append(("s1 pair x2", 2 * timeit(pair(1), x1)))
    stages.append(("down_1", timeit(jax.jit(fa._down), core["down_1"], x1)))
    stages.append(("s2 pair x2", 2 * timeit(pair(2), x2)))
    stages.append(("down_2", timeit(jax.jit(fa._down), core["down_2"], x2)))
    stages.append(("s3 pair", timeit(pair(3), x3)))
    stages.append(("up_2", timeit(jax.jit(fa._up), core["up_2"], x3, x2)))
    stages.append(("up_1", timeit(jax.jit(fa._up), core["up_1"], x2, x1)))
    stages.append(("up_0", timeit(jax.jit(fa._up), core["up_0"], x1, x0)))
    stages.append(("output", timeit(jax.jit(fa._output_block), core["output_block"], x0)))
    tot = 0.0
    for name, s in stages:
        tot += s
        print(f"  {name:12s} {s * 1e3:7.2f} ms", flush=True)
    print(f"  {'SUM':12s} {tot * 1e3:7.2f} ms (standalone; full-model fusion may beat it)",
          flush=True)


if __name__ == "__main__":
    main()
