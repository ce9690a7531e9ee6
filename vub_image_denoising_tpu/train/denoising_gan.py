"""Attention-U-Net / PatchGAN denoising-GAN trainer.

TPU-native port of ``train_denoising_gan`` (bytecode train_denoising_gan.py:173-294).
Reference semantics:
- G = AttentionUNet(1,1), D = PatchGAN(2) on cat(noisy, image); weights_init_normal.
- labels with smoothing: valid = 0.9, fake = 0.1 for D; 1.0 for G (:~215-240).
- D loss = 0.5*(BCE(D(cat(noisy,clean)), 0.9) + BCE(D(cat(noisy,gen)), 0.1))
  + lambda_gp * GP, where GP interpolates clean/gen and conditions on noisy
  (compute_gradient_penalty, :128-144).
- G loss = BCE(D(cat(noisy,gen)), 1.0) + lambda_pixel*L1(gen, clean)
  + lambda_perceptual*VGG19[:16]-L1(gen_3ch, clean_3ch) + lambda_edge*Sobel-edge-L1
  (edge_loss, :159-171).
- Adam(lr 1e-4, betas (0.5, 0.999)) both; StepLR(10, 0.5) both; checkpoints
  ``{prefix}_generator_{epoch}.pth`` / ``{prefix}_discriminator_{epoch}.pth``.
"""

import dataclasses
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.attention_unet import AttentionUNet, PatchGAN
from ..models.vgg import VGG19Features, load_torch_vgg19
from ..parallel.mesh import make_mesh, put_replicated, shard_batch
from ..utils import checkpoint as ckpt_io
from .gan import GANTrainState
from .schedules import step_lr

SOBEL_X = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
SOBEL_Y = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)


def sobel_edges(x):
    """sqrt(Gx^2 + Gy^2 + 1e-6), torch F.conv2d(padding=1) semantics
    (train_denoising_gan.py:159-171; single-channel)."""
    kx = SOBEL_X.reshape(3, 3, 1, 1).astype(x.dtype)
    ky = SOBEL_Y.reshape(3, 3, 1, 1).astype(x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    gx = jax.lax.conv_general_dilated(x, kx, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(x, ky, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    return jnp.sqrt(gx**2 + gy**2 + 1e-6)


def edge_loss(gen, clean):
    return jnp.mean(jnp.abs(sobel_edges(gen) - sobel_edges(clean)))


def bce(pred, target):
    """torch BCELoss on sigmoid outputs."""
    eps = 1e-7
    pred = jnp.clip(pred, eps, 1 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))


def conditional_gradient_penalty(d_apply, d_params, key, noisy, real, fake):
    """compute_gradient_penalty (train_denoising_gan.py:128-144): interpolate
    real/fake, concat the noisy conditioning, penalty on the grad wrt the FULL
    concatenated input."""
    n = real.shape[0]
    alpha = jax.random.uniform(key, (n, 1, 1, 1), real.dtype)
    interp = alpha * real + (1 - alpha) * fake
    full = jnp.concatenate([noisy, interp], axis=-1)

    def d_sum(z):
        return jnp.sum(d_apply(d_params, z))

    grads = jax.grad(d_sum)(full)
    norms = jnp.sqrt(jnp.sum(grads.reshape(n, -1) ** 2, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


@dataclasses.dataclass
class DenoisingGANTrainer:
    lambda_pixel: float = 100.0
    lambda_perceptual: float = 0.1
    lambda_edge: float = 1.0
    lambda_gp: float = 10.0
    lr: float = 1e-4
    betas: tuple = (0.5, 0.999)
    checkpoint_dir: str = "checkpoints"
    checkpoint_prefix: str = "denoising_gan"
    vgg_weights_path: Optional[str] = None
    mesh: Any = None
    writer: Any = None

    def __post_init__(self):
        self.generator = AttentionUNet(1, 1)
        self.discriminator = PatchGAN(2)
        self.vgg = VGG19Features(num_layers=16)

    def init(self, key, sample, steps_per_epoch: int):
        if self.mesh is None:
            self.mesh = make_mesh()
        kg, kd, kv = jax.random.split(key, 3)
        gv = self.generator.init(kg, sample, train=False)
        dv = self.discriminator.init(
            kd, jnp.concatenate([sample, sample], axis=-1), train=False
        )
        self.vgg_params = self.vgg.init(kv, jnp.tile(sample, (1, 1, 1, 3)))
        pretrained = load_torch_vgg19(self.vgg_params, self.vgg_weights_path, num_layers=16)
        if pretrained is not None:
            self.vgg_params = pretrained

        sched = step_lr(self.lr, max(1, steps_per_epoch), step_size=10, gamma=0.5)
        self.tx_g = optax.adam(sched, b1=self.betas[0], b2=self.betas[1])
        self.tx_d = optax.adam(sched, b1=self.betas[0], b2=self.betas[1])
        state = GANTrainState(
            g_params=gv["params"], g_stats=gv.get("batch_stats", {}),
            d_params=dv["params"], d_stats=dv.get("batch_stats", {}),
            g_opt=self.tx_g.init(gv["params"]), d_opt=self.tx_d.init(dv["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        state = put_replicated(state, self.mesh)
        self._build_steps()
        return state

    def batch_sharding(self):
        return shard_batch(self.mesh)

    def _build_steps(self):
        gen, disc, vgg = self.generator, self.discriminator, self.vgg

        def gen_fwd(params, stats, x):
            out, mut = gen.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]

        def d_frozen(d_params, d_stats, x):
            out, _ = disc.apply(
                {"params": d_params, "batch_stats": d_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return out

        def d_step(state, key, noisy, clean):
            fake, new_gstats = gen_fwd(state.g_params, state.g_stats, noisy)
            fake = jax.lax.stop_gradient(fake)

            def loss_fn(d_params):
                dvars = {"params": d_params, "batch_stats": state.d_stats}
                pred_real, mut = disc.apply(
                    dvars, jnp.concatenate([noisy, clean], axis=-1), train=True,
                    mutable=["batch_stats"],
                )
                pred_fake, mut = disc.apply(
                    {"params": d_params, "batch_stats": mut["batch_stats"]},
                    jnp.concatenate([noisy, fake], axis=-1), train=True,
                    mutable=["batch_stats"],
                )
                loss_real = bce(pred_real, 0.9)  # label smoothing
                loss_fake = bce(pred_fake, 0.1)
                gp = conditional_gradient_penalty(
                    lambda p, z: d_frozen(p, state.d_stats, z), d_params,
                    key, noisy, clean, fake,
                )
                return 0.5 * (loss_real + loss_fake) + self.lambda_gp * gp, mut["batch_stats"]

            (d_loss, new_dstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
            updates, new_dopt = self.tx_d.update(grads, state.d_opt, state.d_params)
            return (
                state.replace(
                    d_params=optax.apply_updates(state.d_params, updates),
                    d_opt=new_dopt, d_stats=new_dstats, g_stats=new_gstats,
                ),
                d_loss,
            )

        def g_step(state, key, noisy, clean, vgg_params):
            def loss_fn(g_params):
                fake, new_gstats = gen_fwd(g_params, state.g_stats, noisy)
                pred_fake = d_frozen(
                    state.d_params, state.d_stats,
                    jnp.concatenate([noisy, fake], axis=-1),
                )
                loss_gan = bce(pred_fake, 1.0)
                loss_pixel = jnp.mean(jnp.abs(fake - clean))
                f_fake = vgg.apply(vgg_params, fake)
                f_clean = vgg.apply(vgg_params, clean)
                loss_percep = jnp.mean(jnp.abs(f_fake - f_clean))
                loss_e = edge_loss(fake, clean)
                total = (
                    loss_gan + self.lambda_pixel * loss_pixel
                    + self.lambda_perceptual * loss_percep + self.lambda_edge * loss_e
                )
                return total, (new_gstats, {
                    "gan": loss_gan, "pixel": loss_pixel,
                    "perceptual": loss_percep, "edge": loss_e,
                })

            (g_loss, (new_gstats, parts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.g_params)
            updates, new_gopt = self.tx_g.update(grads, state.g_opt, state.g_params)
            return (
                state.replace(
                    g_params=optax.apply_updates(state.g_params, updates),
                    g_opt=new_gopt, g_stats=new_gstats, step=state.step + 1,
                ),
                g_loss, parts,
            )

        self._jit_d_step = jax.jit(d_step, donate_argnums=(0,))
        self._jit_g_step = jax.jit(g_step, donate_argnums=(0,))
        self._jit_gen_eval = jax.jit(
            lambda params, stats, x: gen.apply(
                {"params": params, "batch_stats": stats}, x, train=False
            )
        )

    def train_epoch(self, state, train_loader, key, epoch: int):
        d_losses, g_losses = [], []
        for batch_idx, (noisy, clean) in enumerate(train_loader):
            k = jax.random.fold_in(jax.random.fold_in(key, epoch), batch_idx)
            kd, kg = jax.random.split(k)
            state, d_loss = self._jit_d_step(state, kd, noisy, clean)
            state, g_loss, parts = self._jit_g_step(state, kg, noisy, clean, self.vgg_params)
            d_losses.append(d_loss)
            g_losses.append(g_loss)
            if self.writer is not None:
                step = epoch * len(train_loader) + batch_idx
                self.writer.add_scalar("Loss/D", float(d_loss), step)
                self.writer.add_scalar("Loss/G", float(g_loss), step)
        return (
            state,
            float(jnp.mean(jnp.stack(d_losses))),
            float(jnp.mean(jnp.stack(g_losses))),
        )

    def save_checkpoint(self, state, epoch: int):
        """Separate generator/discriminator files (train_denoising_gan.py, consts ~:255)."""
        import torch

        os.makedirs(self.checkpoint_dir, exist_ok=True)
        gpath = os.path.join(
            self.checkpoint_dir, f"{self.checkpoint_prefix}_generator_{epoch}.pth"
        )
        dpath = os.path.join(
            self.checkpoint_dir, f"{self.checkpoint_prefix}_discriminator_{epoch}.pth"
        )
        torch.save(ckpt_io.params_to_torch_state_dict(
            {"params": state.g_params, "batch_stats": state.g_stats}), gpath)
        torch.save(ckpt_io.params_to_torch_state_dict(
            {"params": state.d_params, "batch_stats": state.d_stats}), dpath)
        return gpath, dpath

    def fit(self, state, train_loader, val_loader, num_epochs: int,
            key: Optional[jax.Array] = None, checkpoint_every: int = 10):
        from ..utils.preempt import GracefulShutdown

        key = key if key is not None else jax.random.PRNGKey(0)
        history = []
        # SIGTERM/SIGINT (pool preemption) finishes the epoch, checkpoints, exits
        with GracefulShutdown() as stop:
            for epoch in range(num_epochs):
                t0 = time.time()
                state, d_loss, g_loss = self.train_epoch(state, train_loader, key, epoch)
                if stop.requested or (epoch + 1) % checkpoint_every == 0:
                    self.save_checkpoint(state, epoch + 1)
                history.append({
                    "epoch": epoch, "d_loss": d_loss, "g_loss": g_loss,
                    "sec": time.time() - t0,
                })
                if stop.requested:
                    print(f"[preempt] checkpointed through epoch {epoch + 1}; stopping")
                    break
        return state, history


def train_denoising_gan(
    train_loader, val_loader, num_epochs=200, lambda_pixel=100.0,
    lambda_perceptual=0.1, lambda_edge=1.0, lambda_gp=10.0, lr=1e-4,
    betas=(0.5, 0.999), log_dir="runs/denoising_gan",
    checkpoint_dir="checkpoints", checkpoint_prefix="denoising_gan",
    sample_batch=None, writer=None,
):
    """API-parity entry point (train_denoising_gan.py:173-175)."""
    trainer = DenoisingGANTrainer(
        lambda_pixel=lambda_pixel, lambda_perceptual=lambda_perceptual,
        lambda_edge=lambda_edge, lambda_gp=lambda_gp, lr=lr, betas=betas,
        checkpoint_dir=checkpoint_dir, checkpoint_prefix=checkpoint_prefix,
        writer=writer,
    )
    if sample_batch is None:
        sample_batch = next(iter(val_loader))[0]
    state = trainer.init(jax.random.PRNGKey(0), sample_batch, steps_per_epoch=len(train_loader))
    return trainer.fit(state, train_loader, val_loader, num_epochs)
