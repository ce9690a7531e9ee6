"""Second-round XLA profiling: practical peak, packed-XLA blocks, batch scaling,
and an HLO census of the full model.

Answers, on the real chip at the bench config:
 1. practical bf16 matmul peak (the ceiling hand-written or XLA convs could hit),
 2. whether 2x2-packed XLA convs beat the raw 3x3 narrow-channel convs (scale 0/1),
 3. whether batch >128 still scales,
 4. where the full model's time goes beyond the sum of parts (HLO op census).

Run from repo root: python scripts/profile_xla_opts.py
"""

import sys
import time
from collections import Counter

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
    key = jax.random.PRNGKey(0)

    # --- 1. practical matmul peak (bf16 -> f32)
    for m in (4096, 8192):
        a = jax.random.normal(key, (m, m), DTYPE)
        b = jax.random.normal(key, (m, m), DTYPE)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(DTYPE))
        sec = timeit(f, a, b)
        print(f"matmul {m}^3 bf16: {sec * 1e3:7.2f} ms  "
              f"{2 * m**3 / sec / 1e12:6.1f} TFLOP/s", flush=True)

    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.models.fused_apply import _dense_block_xla
    from vub_image_denoising_tpu.ops.packing import (
        conv3x3_packed_xla, pack2x2, pack_vec, unpack2x2,
    )

    model = RDUNet(channels=3, base_filters=BASE)
    params = jax.jit(model.init)(key, jnp.zeros((1, SIZE, SIZE, 3)))
    core = params["params"]["core"]

    # --- 2. packed-XLA dense pair at scales 0/1
    def dense_packed(p, xq):
        def prelu(v, a):
            return jnp.maximum(v, 0) + pack_vec(a).astype(v.dtype) * jnp.minimum(v, 0)

        h = xq
        for i in range(4):
            y = conv3x3_packed_xla(h, p[f"conv_{i}"]["kernel"].astype(xq.dtype),
                                   bias=p[f"conv_{i}"]["bias"])
            y = prelu(y, p[f"actv_{i}"]["alpha"])
            if i < 3:
                h = jnp.concatenate([h, y], axis=-1)
        return y + xq

    # NOTE: dense_packed concatenates PACKED tensors on lanes, whereas the packed
    # weights expect the packed-concat of the original tensors — the channel ORDER
    # differs, so this is NOT numerically the real block.  It has identical shapes
    # and arithmetic though, which is all a throughput probe needs.
    for s in (0, 1):
        c = BASE * 2**s
        h = SIZE // 2**s
        x = jax.random.uniform(key, (BATCH, h, h, c), DTYPE)
        pa, pb = core[f"block_{s}_0"], core[f"block_{s}_1"]
        ktots = [c, c + c // 2, c + 2 * (c // 2), c + 3 * (c // 2)]
        flops = 2 * sum(2 * 9 * kt * ((c // 2) if i < 3 else c)
                        for i, kt in enumerate(ktots)) * BATCH * h * h

        fx = jax.jit(lambda a, b, xx: _dense_block_xla(b, _dense_block_xla(a, xx)))
        sec = timeit(fx, pa, pb, x)
        print(f"s{s} pair XLA raw    {sec * 1e3:7.2f} ms  "
              f"{flops / sec / 1e12:6.1f} TFLOP/s", flush=True)

        fq = jax.jit(lambda a, b, xx: unpack2x2(dense_packed(b, dense_packed(a, pack2x2(xx)))))
        sec = timeit(fq, pa, pb, x)
        print(f"s{s} pair XLA packed {sec * 1e3:7.2f} ms  "
              f"{flops / sec / 1e12:6.1f} TFLOP/s-equiv (x1.78 real FLOPs)", flush=True)

    # --- 3. batch scaling of the full model
    fwd = jax.jit(model.apply)
    for batch in (64, 128, 192):
        try:
            x = jax.random.uniform(key, (batch, SIZE, SIZE, 3), DTYPE) * 2 - 1
            sec = timeit(fwd, params, x, iters=5)
            print(f"full model batch {batch}: {sec * 1e3:7.1f} ms  "
                  f"{batch * SIZE * SIZE / 1e6 / sec:6.1f} MP/s", flush=True)
        except Exception as e:
            print(f"batch {batch} failed: {type(e).__name__}", flush=True)

    # --- 4. HLO census of the compiled model
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), DTYPE) * 2 - 1
    compiled = jax.jit(model.apply).lower(params, x).compile()
    txt = compiled.as_text()
    ops = Counter()
    for line in txt.splitlines():
        line = line.strip()
        if "=" in line and not line.startswith(("HloModule", "ENTRY", "%", "}", "ROOT")):
            rhs = line.split("=", 1)[1].strip()
            if " " in rhs:
                opname = rhs.split(" ", 1)[1].split("(", 1)[0].strip()
                ops[opname.split(".")[0]] += 1
    total = sum(ops.values())
    print(f"\nHLO ops in compiled module: {total}", flush=True)
    for name, cnt in ops.most_common(15):
        print(f"  {name:28s} {cnt}", flush=True)
    try:
        mem = compiled.memory_analysis()
        print(f"peak memory: {mem.temp_size_in_bytes / 1e9:.2f} GB temp, "
              f"{mem.argument_size_in_bytes / 1e9:.2f} GB args", flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    main()
