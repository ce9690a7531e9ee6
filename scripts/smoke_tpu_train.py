"""Real-TPU smoke of every trainer family: a few steps each, assert finite losses.

Covers on hardware what the CPU suite covers functionally: supervised RDUNet,
diffusion RDUNet_T (flax + xla engines), RCA-GAN (WGAN-GP second-order grads under
jit), and the attention-U-Net denoising GAN.  Run from repo root:
  python scripts/smoke_tpu_train.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    ok = True

    # --- supervised RDUNet
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.train import DiffusionTrainer, SupervisedTrainer

    noisy = jax.random.uniform(key, (8, 64, 64, 3), jnp.bfloat16) * 2 - 1
    clean = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3), jnp.bfloat16) * 2 - 1
    sup = SupervisedTrainer(RDUNet(channels=3, base_filters=16), accumulation_steps=2,
                            compute_dtype=jnp.bfloat16)
    state = sup.init(key, jnp.zeros((8, 64, 64, 3)), steps_per_epoch=10)
    losses = []
    for _ in range(3):
        state, loss = sup._jit_step(state, noisy, clean)
        losses.append(float(loss))
    print(f"supervised losses: {losses}", flush=True)
    ok &= all(np.isfinite(losses))

    # --- diffusion (both engines)
    for engine in ("flax", "xla"):
        diff = DiffusionTrainer(base_filters=16, timesteps=4, accumulation_steps=1,
                                compute_dtype=jnp.bfloat16, engine=engine)
        dstate = diff.init(key, jnp.zeros((8, 64, 64, 3)), steps_per_epoch=10)
        dstate, dloss = diff._jit_step(dstate, jax.random.PRNGKey(2), noisy, clean)
        out = diff._jit_sample(dstate.params, noisy)
        print(f"diffusion[{engine}] loss: {float(dloss):.4f}, sample {out.shape}",
              flush=True)
        ok &= bool(np.isfinite(float(dloss)))

    # --- RCA-GAN (WGAN-GP: nested grad-of-grad under jit)
    from vub_image_denoising_tpu.train.gan import RCAGANTrainer

    g = RCAGANTrainer(disc_input_hw=64, checkpoint_dir="/tmp/smoke_ckpt")
    gray_a = jax.random.uniform(key, (2, 64, 64, 1)) * 0.2 - 0.1
    gray_b = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 1)) * 0.2 - 0.1
    gstate = g.init(jax.random.PRNGKey(4), gray_a, steps_per_epoch=10)
    gstate, dl = g._jit_d_step(gstate, jax.random.PRNGKey(5), gray_a, gray_b)
    gstate, gl, _ = g._jit_g_step(gstate, jax.random.PRNGKey(6), gray_a, gray_b,
                                  g.vgg_params)
    print(f"rca-gan d_loss {float(dl):.4f} g_loss {float(gl):.4f}", flush=True)
    ok &= bool(np.isfinite(float(dl)) and np.isfinite(float(gl)))

    # --- attention-U-Net denoising GAN
    from vub_image_denoising_tpu.train.denoising_gan import DenoisingGANTrainer

    t = DenoisingGANTrainer(checkpoint_dir="/tmp/smoke_ckpt")
    tstate = t.init(jax.random.PRNGKey(7), gray_a, steps_per_epoch=10)
    tstate, dl2 = t._jit_d_step(tstate, jax.random.PRNGKey(8), gray_a, gray_b)
    tstate, gl2, _ = t._jit_g_step(tstate, jax.random.PRNGKey(9), gray_a, gray_b,
                                   t.vgg_params)
    print(f"denoising-gan d_loss {float(dl2):.4f} g_loss {float(gl2):.4f}", flush=True)
    ok &= bool(np.isfinite(float(dl2)) and np.isfinite(float(gl2)))

    print("SMOKE OK" if ok else "SMOKE FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
