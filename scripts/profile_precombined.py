"""Per-scale probe: original dense-block pair vs the lane-packed (precombined)
decomposition (models/fused_apply.py::_dense_block_xla_precombined).

Same linear algebra, regrouped by source tensor so narrow-growth convs get wide
output-channel dims and all concats disappear.  Run from repo root on TPU:
    python scripts/profile_precombined.py [scale ...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.models.fused_apply import (
    _dense_block_xla,
    _dense_block_xla_precombined,
)

BATCH = 128
SCALES = {0: (32, 256), 1: (64, 128), 2: (128, 64), 3: (256, 32)}


def make_params(key, c, g, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    p = {}
    kt = c
    for i in range(4):
        n = g if i < 3 else c
        p[f"conv_{i}"] = {
            "kernel": jax.random.normal(ks[i], (3, 3, kt, n), dtype) * 0.05,
            "bias": jnp.zeros((n,), dtype),
        }
        p[f"actv_{i}"] = {"alpha": jnp.full((n,), 0.25, dtype)}
        kt += g if i < 3 else 0
    return p


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.device_get(fn(*args)[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.device_get(y[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    scales = [int(a) for a in sys.argv[1:]] or list(SCALES)
    key = jax.random.PRNGKey(0)
    for s in scales:
        c, size = SCALES[s]
        g = c // 2
        p = make_params(key, c, g)
        x = jax.random.normal(key, (BATCH, size, size, 3), jnp.bfloat16)
        x = jnp.tile(x, (1, 1, 1, -(-c // 3)))[..., :c]

        def pair(fn, pp, xx):
            return fn(pp, fn(pp, xx))

        ref = jax.jit(lambda pp, xx: pair(_dense_block_xla, pp, xx))
        new = jax.jit(lambda pp, xx: pair(_dense_block_xla_precombined, pp, xx))
        err = float(
            jnp.max(jnp.abs(ref(p, x).astype(jnp.float32) - new(p, x).astype(jnp.float32)))
        )
        t_ref = timeit(ref, p, x)
        t_new = timeit(new, p, x)
        # FLOPs of one block: 2 * 9 * sum(K_i * N_i) per pixel, x2 blocks
        flops_px = 2 * 9 * sum(
            (c + i * g) * (g if i < 3 else c) for i in range(4)
        ) * 2
        px = BATCH * size * size
        print(
            f"scale {s} (c={c}, {size}^2): ref {t_ref*1e3:7.2f} ms "
            f"({flops_px*px/t_ref/1e12:6.1f} TF/s)  precombined {t_new*1e3:7.2f} ms "
            f"({flops_px*px/t_new/1e12:6.1f} TF/s)  speedup {t_ref/t_new:5.2f}x  "
            f"max|diff| {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
