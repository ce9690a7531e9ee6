"""Paper-flagship RDUNet-128 (166.4M params) on real TPU: inference + one train step.

Round-1 recorded 5.4 MP/s at batch 8 via the flax path; this re-measures with the
optimized engine and checks the supervised train step fits HBM with remat.

Run from repo root: python scripts/bench_rdunet128.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

SIZE = 256


def timeit(fn, *args, iters=5, warmup=2):
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
    from vub_image_denoising_tpu.train import SupervisedTrainer

    key = jax.random.PRNGKey(0)
    model = RDUNet(channels=3, base_filters=128)
    params = jax.jit(model.init)(key, jnp.zeros((1, SIZE, SIZE, 3)))

    for batch in (8, 16, 32):
        try:
            x = jax.random.uniform(key, (batch, SIZE, SIZE, 3), jnp.bfloat16) * 2 - 1
            fwd = jax.jit(lambda v, xx: rdunet_apply_fused(v, xx, engine="xla"))
            sec = timeit(fwd, params, x)
            print(f"RDUNet-128 inference batch {batch}: {sec * 1e3:7.1f} ms  "
                  f"{batch * SIZE * SIZE / 1e6 / sec:5.2f} MP/s", flush=True)
        except Exception as e:
            print(f"inference batch {batch} failed: {type(e).__name__}", flush=True)

    # reference training config: batch 4, AdamW — with remat for HBM
    try:
        batch = 4
        noisy = jax.random.uniform(key, (batch, SIZE, SIZE, 3), jnp.bfloat16) * 2 - 1
        clean = jax.random.uniform(jax.random.PRNGKey(1), (batch, SIZE, SIZE, 3),
                                   jnp.bfloat16) * 2 - 1
        sup = SupervisedTrainer(RDUNet(channels=3, base_filters=128, remat=True),
                                accumulation_steps=1, compute_dtype=jnp.bfloat16)
        state = sup.init(key, jnp.zeros((batch, SIZE, SIZE, 3)), steps_per_epoch=100)
        state, loss = sup._jit_step(state, noisy, clean)
        jax.device_get(loss)
        t0 = time.perf_counter()
        for _ in range(3):
            state, loss = sup._jit_step(state, noisy, clean)
        jax.device_get(loss)
        sec = (time.perf_counter() - t0) / 3
        print(f"RDUNet-128 train step batch {batch} (remat, bf16): "
              f"{sec * 1e3:7.1f} ms/step, loss finite: "
              f"{bool(jnp.isfinite(loss))}", flush=True)
    except Exception as e:
        print(f"train step failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
