"""RCA-GAN trainer — TPU-native port of ``train_rca_gan`` (paper_gan.py:317-457).

Reference semantics:
- Generator(1,1) / Discriminator(1) on grayscale pairs (:320-321); weights_init kaiming
  fan_in/leaky on Conv+Linear (:333, applied in our module initializers).
- D step (:~370-385): d_loss = -mean(D(gt)) + mean(D(G(degraded).detach())) + GP;
  Adam(lr 5e-5, betas (0.5, 0.999)), grad-clip 1.0.
- G step: g_loss = MultimodalLoss(G(degraded), gt, degraded) with
  (lambda1, lambda2, lambda3, lambda4) = (lambda_pixel, lambda_perceptual,
  lambda_texture, 1) — reference argument names are shifted vs the loss slots; defaults
  (1, 0.01, 0.001, 1).  Grad-clip 1.0.
- StepLR(10, 0.5) on both optimizers; checkpoint every 10 epochs as
  ``checkpoint_epoch_{n}.pth`` with {epoch, generator_state_dict,
  discriminator_state_dict, optimizer_G_state_dict, optimizer_D_state_dict} (:447-453).

TPU-native design: the D and G updates are two jitted steps over the data-parallel
mesh; the WGAN-GP nested gradient is a ``jax.grad`` inside the loss (second-order
autodiff under jit).  BatchNorm running stats are updated by the main G/D forwards; the
GP's extra D evaluation does not update stats (documented deviation — running stats
only affect eval mode).
"""

import dataclasses
import inspect
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.rca_gan import Discriminator, Generator
from ..models.vgg import VGG19Features, load_torch_vgg19
from ..parallel.mesh import make_mesh, put_replicated, shard_batch
from ..utils import checkpoint as ckpt_io
from .gan_losses import gradient_penalty, multimodal_loss
from .schedules import step_lr


@struct.dataclass
class GANTrainState:
    g_params: Any
    g_stats: Any
    d_params: Any
    d_stats: Any
    g_opt: Any
    d_opt: Any
    step: jax.Array


@dataclasses.dataclass
class RCAGANTrainer:
    in_channels: int = 1
    out_channels: int = 1
    # NOTE the reference's argument-shift quirk (module docstring): these three
    # land on multimodal slots (lambda1=VGG-feature MSE, lambda2=content L1,
    # lambda3=texture) — i.e. 'lambda_pixel' actually weights the PERCEPTUAL
    # term and the pixel L1 gets 0.01.  Reproduced exactly by default.
    lambda_pixel: float = 1.0
    lambda_perceptual: float = 0.01
    lambda_texture: float = 0.001
    # adversarial slot weight: the reference hardcodes 1 (paper_gan.py:287);
    # exposed as the G-objective-balance ablation knob (0 = fidelity-only G)
    lambda_adv: float = 1.0
    # linear warm-up of the adversarial slot over this many G steps (0 = off,
    # the reference behavior).  Documented deviation knob: the round-4 ablation
    # measured the content-anchored config (#7) converging then eroding late as
    # the unbounded WGAN value grows; ramping lambda_adv from 0 to its full
    # value lets the critic mature against an already-fidelity-trained G
    # before its gradient reaches full weight.  Computed from state.step
    # inside the jitted G step — a traced scalar, no per-epoch recompiles.
    adv_ramp_steps: int = 0
    lambda_gp: float = 10.0
    lr: float = 5e-5
    betas: tuple = (0.5, 0.999)
    checkpoint_dir: str = "checkpoints"
    disc_input_hw: int = 256
    vgg_weights_path: Optional[str] = None
    mesh: Any = None
    writer: Any = None
    # C17: pass generator=GeneratorWithDiffusion(...) to train the diffusion-GAN
    # hybrid against the same critic/losses (experimental_diffusion_gan.py:390-395).
    # Generators whose __call__ takes a ``key`` arg (the hybrid's per-batch DDPM
    # timestep + q_sample noise) get a fresh fold of the step key.
    generator: Any = None
    # critic_norm: "bn" (reference) | "none" | "layernorm" — the WGAN-GP critic
    # normalization ablation (see models/rca_gan.py::Discriminator).
    critic_norm: str = "bn"

    def __post_init__(self):
        if self.generator is None:
            self.generator = Generator(self.in_channels, self.out_channels)
        self._gen_takes_key = "key" in inspect.signature(
            type(self.generator).__call__
        ).parameters
        self.discriminator = Discriminator(self.in_channels, norm=self.critic_norm)
        self.vgg = VGG19Features(num_layers=8)

    def _gen_init(self, key, sample):
        if self._gen_takes_key:
            ki, kf = jax.random.split(key)
            return jax.jit(self.generator.init, static_argnames=("train",))(
                ki, sample, kf, train=False
            )
        return jax.jit(self.generator.init, static_argnames=("train",))(
            key, sample, train=False
        )

    def init(self, key, sample, steps_per_epoch: int):
        if self.mesh is None:
            self.mesh = make_mesh()
        kg, kd, kv = jax.random.split(key, 3)
        gv = self._gen_init(kg, sample)
        disc_sample = jnp.zeros(
            (sample.shape[0], self.disc_input_hw, self.disc_input_hw, self.in_channels),
            sample.dtype,
        )
        dv = jax.jit(self.discriminator.init, static_argnames=("train",))(kd, disc_sample, train=False)
        self.vgg_params = self.vgg.init(kv, sample)
        pretrained = load_torch_vgg19(self.vgg_params, self.vgg_weights_path)
        if pretrained is not None:
            self.vgg_params = pretrained

        sched = step_lr(self.lr, max(1, steps_per_epoch), step_size=10, gamma=0.5)
        self.tx_g = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(sched, b1=self.betas[0], b2=self.betas[1]),
        )
        self.tx_d = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(sched, b1=self.betas[0], b2=self.betas[1]),
        )
        state = GANTrainState(
            g_params=gv["params"],
            g_stats=gv.get("batch_stats", {}),
            d_params=dv["params"],
            d_stats=dv.get("batch_stats", {}),
            g_opt=self.tx_g.init(gv["params"]),
            d_opt=self.tx_d.init(dv["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        state = put_replicated(state, self.mesh)
        self._build_steps()
        return state

    def batch_sharding(self):
        return shard_batch(self.mesh)

    def _build_steps(self):
        gen, disc, vgg = self.generator, self.discriminator, self.vgg
        tx_g, tx_d = self.tx_g, self.tx_d
        lam_gp = self.lambda_gp
        takes_key = self._gen_takes_key

        def gen_fwd(params, stats, x, key):
            kw = {"key": key} if takes_key else {}
            out, mut = gen.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"], **kw,
            )
            return out, mut["batch_stats"]

        def d_apply_frozen(d_params, d_stats, x):
            # train-mode BN statistics, but running-stat updates are discarded
            out, _ = disc.apply(
                {"params": d_params, "batch_stats": d_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return out

        def d_step(state: GANTrainState, key, degraded, gt):
            kf, key = jax.random.split(key)
            fake, new_gstats = gen_fwd(state.g_params, state.g_stats, degraded, kf)
            fake = jax.lax.stop_gradient(fake)

            def loss_fn(d_params):
                dvars = {"params": d_params, "batch_stats": state.d_stats}
                d_real, mut = disc.apply(dvars, gt, train=True, mutable=["batch_stats"])
                d_fake, mut = disc.apply(
                    {"params": d_params, "batch_stats": mut["batch_stats"]},
                    fake, train=True, mutable=["batch_stats"],
                )
                gp = gradient_penalty(
                    lambda p, x: d_apply_frozen(p, state.d_stats, x),
                    d_params, key, gt, fake, lam_gp,
                )
                loss = -jnp.mean(d_real) + jnp.mean(d_fake) + gp
                return loss, mut["batch_stats"]

            (d_loss, new_dstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.d_params
            )
            updates, new_dopt = tx_d.update(grads, state.d_opt, state.d_params)
            new_dparams = optax.apply_updates(state.d_params, updates)
            return (
                state.replace(
                    d_params=new_dparams, d_opt=new_dopt,
                    d_stats=new_dstats, g_stats=new_gstats,
                ),
                d_loss,
            )

        def g_step(state: GANTrainState, key, degraded, gt, vgg_params):
            kf, key = jax.random.split(key)
            lam_adv = self.lambda_adv
            if self.adv_ramp_steps:
                lam_adv = lam_adv * jnp.minimum(
                    1.0, (state.step + 1).astype(jnp.float32) / self.adv_ramp_steps
                )

            def loss_fn(g_params):
                fake, new_gstats = gen_fwd(g_params, state.g_stats, degraded, kf)
                total, parts = multimodal_loss(
                    lambda p, x: vgg.apply(p, x), vgg_params,
                    lambda p, x: d_apply_frozen(p, state.d_stats, x), state.d_params,
                    key, fake, gt,
                    lambda1=self.lambda_pixel, lambda2=self.lambda_perceptual,
                    lambda3=self.lambda_texture, lambda4=lam_adv, lambda_gp=lam_gp,
                )
                return total, (new_gstats, parts)

            (g_loss, (new_gstats, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.g_params)
            updates, new_gopt = tx_g.update(grads, state.g_opt, state.g_params)
            new_gparams = optax.apply_updates(state.g_params, updates)
            return (
                state.replace(
                    g_params=new_gparams, g_opt=new_gopt, g_stats=new_gstats,
                    step=state.step + 1,
                ),
                g_loss,
                parts,
            )

        def val_loss(state: GANTrainState, key, degraded, gt, vgg_params):
            # Reference validation (paper_gan.py bytecode :415-424): generator.eval(),
            # no_grad, loss = multimodal_loss(G(degraded), gt, degraded) summed over
            # val_loader then /= len(val_loader) — the FULL generator objective
            # (perceptual + content + texture + WGAN-GP adversarial), not plain L1.
            # D batch-stats handling matches d_apply_frozen (documented deviation:
            # torch updates D running stats during no_grad val; we discard them).
            kf, key = jax.random.split(key)
            fake = gen.apply(
                {"params": state.g_params, "batch_stats": state.g_stats},
                degraded, train=False, **({"key": kf} if takes_key else {}),
            )
            total, _ = multimodal_loss(
                lambda p, x: vgg.apply(p, x), vgg_params,
                lambda p, x: d_apply_frozen(p, state.d_stats, x), state.d_params,
                key, fake, gt,
                lambda1=self.lambda_pixel, lambda2=self.lambda_perceptual,
                lambda3=self.lambda_texture, lambda4=self.lambda_adv, lambda_gp=lam_gp,
            )
            return total

        self._jit_d_step = jax.jit(d_step, donate_argnums=(0,))
        self._jit_g_step = jax.jit(g_step, donate_argnums=(0,))
        self._jit_val_loss = jax.jit(val_loss)
        if takes_key:
            # the hybrid's eval forward is stochastic (q_sample draw), exactly as
            # torch .eval() leaves the reference's randomness live
            self._jit_gen_eval = jax.jit(
                lambda params, stats, x, key: gen.apply(
                    {"params": params, "batch_stats": stats}, x, key, train=False
                )
            )
        else:
            self._jit_gen_eval = jax.jit(
                lambda params, stats, x: gen.apply(
                    {"params": params, "batch_stats": stats}, x, train=False
                )
            )

    def generate(self, state, x, key=None):
        """Eval-mode generator forward; ``key`` is required for (and only used by)
        key-taking generators such as the C17 hybrid."""
        if self._gen_takes_key:
            key = key if key is not None else jax.random.PRNGKey(0)
            return self._jit_gen_eval(state.g_params, state.g_stats, x, key)
        return self._jit_gen_eval(state.g_params, state.g_stats, x)

    def train_epoch(self, state, train_loader, key, epoch: int, log_every: int = 10):
        d_losses, g_losses = [], []
        for batch_idx, (degraded, gt) in enumerate(train_loader):
            k = jax.random.fold_in(jax.random.fold_in(key, epoch), batch_idx)
            kd, kg = jax.random.split(k)
            state, d_loss = self._jit_d_step(state, kd, degraded, gt)
            state, g_loss, parts = self._jit_g_step(state, kg, degraded, gt, self.vgg_params)
            d_losses.append(d_loss)
            g_losses.append(g_loss)
            if self.writer is not None and batch_idx % log_every == 0:
                step = epoch * len(train_loader) + batch_idx
                self.writer.add_scalar("Loss/Discriminator", float(d_loss), step)
                self.writer.add_scalar("Loss/Generator", float(g_loss), step)
                self.writer.add_scalar("Loss/Perceptual", float(parts["perceptual"]), step)
                self.writer.add_scalar("Loss/Content", float(parts["content"]), step)
                self.writer.add_scalar("Loss/Texture", float(parts["texture"]), step)
                self.writer.add_scalar("Loss/Adversarial", float(parts["adversarial"]), step)
        return state, float(jnp.mean(jnp.stack(d_losses))), float(jnp.mean(jnp.stack(g_losses)))

    def validate(self, state, val_loader, key, epoch: int):
        """Per-epoch validation loss over the val loader ('Loss/Validation').

        Matches the bytecode-recovered reference exactly (paper_gan.py :415-425):
        eval-mode generator, full multimodal objective per batch, mean over the
        loader.  The GP's per-sample eps draws use a fresh fold of ``key``."""
        losses = []
        for batch_idx, (degraded, gt) in enumerate(val_loader):
            k = jax.random.fold_in(jax.random.fold_in(key, epoch), batch_idx)
            losses.append(float(
                self._jit_val_loss(state, k, degraded, gt, self.vgg_params)
            ))
        vloss = float(np.mean(losses)) if losses else float("nan")
        if self.writer is not None:
            self.writer.add_scalar("Loss/Validation", vloss, epoch + 1)
        return vloss

    def save_checkpoint(self, state, epoch: int):
        """Reference layout (paper_gan.py:447-453)."""
        import torch

        path = os.path.join(self.checkpoint_dir, f"checkpoint_epoch_{epoch + 1}.pth")
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        payload = {
            "epoch": epoch + 1,
            "generator_state_dict": ckpt_io.params_to_torch_state_dict(
                {"params": state.g_params, "batch_stats": state.g_stats}
            ),
            "discriminator_state_dict": ckpt_io.params_to_torch_state_dict(
                {"params": state.d_params, "batch_stats": state.d_stats}
            ),
            "optimizer_G_state_dict": {},
            "optimizer_D_state_dict": {},
            # flattened tensors (not pickled optax trees) so the file loads
            # under torch.load's safe weights-only default; rebuild with
            # ckpt_io.safe_to_optax_state against a live trainer's opt states
            "optax_g_leaves": ckpt_io.optax_state_to_safe(state.g_opt),
            "optax_d_leaves": ckpt_io.optax_state_to_safe(state.d_opt),
        }
        torch.save(payload, path)
        return path

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
                vloss = self.validate(state, val_loader, key, epoch)
                if stop.requested or (epoch + 1) % checkpoint_every == 0:
                    self.save_checkpoint(state, epoch)
                history.append({
                    "epoch": epoch, "d_loss": d_loss, "g_loss": g_loss,
                    "val_loss": vloss, "sec": time.time() - t0,
                })
                if stop.requested:
                    print(f"[preempt] checkpointed through epoch {epoch + 1}; stopping")
                    break
        return state, history


def train_rca_gan(
    train_loader, val_loader, num_epochs=200, lambda_pixel=1.0,
    lambda_perceptual=0.01, lambda_texture=0.001, lr=5e-5, betas=(0.5, 0.999),
    checkpoint_dir="checkpoints", sample_batch=None, writer=None,
):
    """API-parity entry point (paper_gan.py:317)."""
    trainer = RCAGANTrainer(
        lambda_pixel=lambda_pixel, lambda_perceptual=lambda_perceptual,
        lambda_texture=lambda_texture, lr=lr, betas=betas,
        checkpoint_dir=checkpoint_dir, writer=writer,
    )
    if sample_batch is None:
        sample_batch = next(iter(val_loader))[0]
    trainer.disc_input_hw = sample_batch.shape[1]
    state = trainer.init(jax.random.PRNGKey(0), sample_batch, steps_per_epoch=len(train_loader))
    return trainer.fit(state, train_loader, val_loader, num_epochs)


def weights_init_normal(params, key):
    """The hybrid module's init (experimental_diffusion_gan.py:405-411): conv kernels
    ~ N(0, 0.02); BatchNorm scale ~ N(1, 0.02), BatchNorm bias = 0.  Linear layers and
    conv biases are untouched (the reference only matches 'Conv' / 'BatchNorm' class
    names).  Applied to a flax param tree: 4-D "kernel" leaves are conv kernels;
    leaves under a "stats" module are BatchNorm scale/bias."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(flat))

    def init_leaf(path, leaf, k):
        names = [p.key for p in path]
        if names[-1] == "kernel" and leaf.ndim == 4:
            return 0.02 * jax.random.normal(k, leaf.shape, leaf.dtype)
        if "stats" in names and names[-1] == "scale":
            return 1.0 + 0.02 * jax.random.normal(k, leaf.shape, leaf.dtype)
        if "stats" in names and names[-1] == "bias":
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_unflatten(
        treedef, [init_leaf(p, l, k) for (p, l), k in zip(flat, keys)]
    )


def train_rca_gan_diffusion(
    train_loader, val_loader, num_epochs=200, lambda_pixel=1.0,
    lambda_perceptual=0.01, lambda_texture=0.001, lr=5e-5, betas=(0.5, 0.999),
    checkpoint_dir="checkpoints", sample_batch=None, writer=None,
    num_timesteps=1000,
):
    """C17 entry: the diffusion-GAN hybrid's ``train_rca_gan`` variant
    (experimental_diffusion_gan.py:390-395 — GeneratorWithDiffusion(1, 1) against the
    same RCA-GAN Discriminator, MultimodalLoss(D, λpix, λperc, λtex, 1), Adam G/D +
    StepLR(10, 0.5), defaults (200, 1, 0.01, 0.001, 5e-5, (0.5, 0.999))); both nets
    re-initialized with ``weights_init_normal`` (:405-414)."""
    from ..models.experimental import GeneratorWithDiffusion

    trainer = RCAGANTrainer(
        generator=GeneratorWithDiffusion(1, 1, num_timesteps=num_timesteps),
        lambda_pixel=lambda_pixel, lambda_perceptual=lambda_perceptual,
        lambda_texture=lambda_texture, lr=lr, betas=betas,
        checkpoint_dir=checkpoint_dir, writer=writer,
    )
    if sample_batch is None:
        sample_batch = next(iter(val_loader))[0]
    trainer.disc_input_hw = sample_batch.shape[1]
    state = trainer.init(jax.random.PRNGKey(0), sample_batch, steps_per_epoch=len(train_loader))
    ki, kd = jax.random.split(jax.random.PRNGKey(1))
    state = state.replace(
        g_params=weights_init_normal(state.g_params, ki),
        d_params=weights_init_normal(state.d_params, kd),
    )
    return trainer.fit(state, train_loader, val_loader, num_epochs)
