"""Training-step throughput on real TPU: supervised + diffusion jitted steps.

Reports ms/step and megapixels/sec of training throughput (fwd+bwd+update) at the
reference batch geometry.  Run from repo root: python scripts/bench_train.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

BATCH = 32
SIZE = 256


def timeit(fn, *args, iters=5, warmup=2, donate_state=False):
    state = args[0]
    for _ in range(warmup):
        out = fn(state, *args[1:])
        state = out[0]
        jax.device_get(out[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(state, *args[1:])
        state = out[0]
    jax.device_get(out[1])
    return (time.perf_counter() - t0) / iters


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.train import DiffusionTrainer, SupervisedTrainer

    key = jax.random.PRNGKey(0)

    def data(batch):
        return (jax.random.uniform(key, (batch, SIZE, SIZE, 3), jnp.bfloat16) * 2 - 1,
                jax.random.uniform(jax.random.PRNGKey(1), (batch, SIZE, SIZE, 3),
                                   jnp.bfloat16) * 2 - 1)

    # batch 32 without remat OOMs 16GB HBM (lane-padded full-res residuals);
    # the sweet spot (BASELINE.md) is batch 128 + engine="xla" + remat
    for batch, remat, engine in ((16, False, "flax"), (32, True, "flax"),
                                 (128, True, "xla")):
        try:
            noisy, clean = data(batch)
            sup = SupervisedTrainer(
                RDUNet(channels=3, base_filters=32,
                       remat=remat if engine == "flax" else False),
                accumulation_steps=1, compute_dtype=jnp.bfloat16,
                engine=engine, remat=remat,
            )
            state = sup.init(key, jnp.zeros((batch, SIZE, SIZE, 3)), steps_per_epoch=100)
            sec = timeit(sup._jit_step, state, noisy, clean)
            mp = batch * SIZE * SIZE / 1e6 / sec
            print(f"supervised step (RDUNet-32, batch {batch}, bf16, remat={remat}, "
                  f"engine={engine}): {sec * 1e3:7.1f} ms/step  {mp:5.1f} MP/s", flush=True)
        except Exception as e:
            print(f"supervised batch {batch} remat={remat} engine={engine} failed: "
                  f"{type(e).__name__}", flush=True)

    for batch, remat, engine in ((16, True, "flax"), (16, True, "xla"),
                                 (128, True, "xla")):
        try:
            noisy, clean = data(batch)
            diff = DiffusionTrainer(base_filters=32, accumulation_steps=1,
                                    compute_dtype=jnp.bfloat16, remat=remat,
                                    engine=engine)
            dstate = diff.init(key, jnp.zeros((batch, SIZE, SIZE, 3)), steps_per_epoch=100)
            sec = timeit(lambda s, n, c: diff._jit_step(s, jax.random.PRNGKey(2), n, c),
                         dstate, noisy, clean)
            mp = batch * SIZE * SIZE / 1e6 / sec
            print(f"diffusion step (RDUNet_T-32, batch {batch}, bf16, remat={remat}, "
                  f"engine={engine}): {sec * 1e3:7.1f} ms/step  {mp:5.1f} MP/s", flush=True)
        except Exception as e:
            print(f"diffusion batch {batch} engine={engine} failed: "
                  f"{type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
