"""Interpolation-diffusion trainer + CLI — the framework's primary entry point.

TPU-native port of diffusion_denoising/diffusion_RDUnet.py:76-315 with CLI flag parity
(:292-311).  Reference semantics reproduced in the jitted train step:
- per-image timestep sampling: uniform ``randint(0, T+1)`` as float (:87) or
  Beta(2,1)-biased ``beta*T`` (:71-73);
- forward interpolation ``alpha*noisy + (1-alpha)*clean`` with alpha = t/T (:99-100);
- a SINGLE U-Net call on the interpolated image (not full sampling) (:106);
- combined loss (default pure Charbonnier) against clean (:109);
- gradient clipping at 0.1 (:113) then optimizer step every ``accumulation_steps``.

Deviation (documented): the reference's gradient accumulation is broken by design —
``train_step_checkpointed`` zero-grads every batch (:78) so only every K-th batch's
gradient reaches the optimizer.  We implement real accumulation (sum of micro-batch
gradients, like the supervised trainer); set ``accumulation_steps=1`` for the
reference's effective behavior.

Validation per epoch runs the full ``improved_sampling`` reverse process on one val
batch (:137-141) — here a single jitted lax.scan.  Checkpoints are written per epoch in
the reference layout ``{output_dir}/diffusion_RDUNet_model_checkpointed_epoch_{n}.pth``
(:170-178) with 'unet.'-prefixed model keys, plus a final bare state_dict (:284-286),
plus a native orbax sidecar carrying the full optax state for exact resume.
"""

import argparse
import dataclasses
import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.interpolation import InterpolationDiffusion
from ..diffusion.losses import combined_loss
from ..models.rdunet import RDUNetT
from ..parallel.mesh import shard_batch
from ..utils import checkpoint as ckpt_io
from .schedules import make_optimizer
from .state import ShardedTrainerMixin, TrainState
from .supervised import effective_accumulation

ASCII_BANNER = r"""
    ██    ██ ██    ██ ██████       █████  ██     ██       █████  ██████
    ██    ██ ██    ██ ██   ██     ██   ██ ██     ██      ██   ██ ██   ██
    ██    ██ ██    ██ ██████      ███████ ██     ██      ███████ ██████
     ██  ██  ██    ██ ██   ██     ██   ██ ██     ██      ██   ██ ██   ██
      ████    ██████  ██████      ██   ██ ██     ███████ ██   ██ ██████
"""


def sample_timesteps(key, batch_size: int, timesteps: int, distribution: str = "uniform"):
    """Per-image t in [0, T]: uniform integers (diffusion_RDUnet.py:87) or
    Beta(2,1)-biased toward T (:71-73)."""
    if distribution == "biased":
        return jax.random.beta(key, 2.0, 1.0, (batch_size,)) * timesteps
    return jax.random.randint(key, (batch_size,), 0, timesteps + 1).astype(jnp.float32)


def make_diffusion_train_step(
    unet_apply: Callable,
    diffusion: InterpolationDiffusion,
    tx: optax.GradientTransformation,
    accumulation_steps: int = 1,
    distribution: str = "uniform",
    loss_weights=(0.0, 1.0, 0.0),
    compute_dtype=jnp.float32,
):
    """Jitted step: (state, key, noisy, clean) -> (new_state, loss)."""
    mse_w, charb_w, ssim_w = loss_weights
    T = diffusion.timesteps

    def micro_loss(params, key, noisy, clean):
        t = sample_timesteps(key, noisy.shape[0], T, distribution)
        alpha = (t / T).reshape(-1, 1, 1, 1).astype(compute_dtype)
        noisy = noisy.astype(compute_dtype)
        clean_c = clean.astype(compute_dtype)
        interpolated = alpha * noisy + (1 - alpha) * clean_c
        pred = unet_apply(params, interpolated, (t / T).astype(compute_dtype))
        return combined_loss(
            pred.astype(jnp.float32), clean.astype(jnp.float32),
            mse_weight=mse_w, charbonnier_weight=charb_w, ssim_weight=ssim_w,
        )

    grad_fn = jax.value_and_grad(micro_loss)

    def step(state: TrainState, key, noisy, clean):
        n = noisy.shape[0]
        acc = effective_accumulation(n, accumulation_steps)
        mb = n // acc
        noisy = noisy[: mb * acc].reshape(acc, mb, *noisy.shape[1:])
        clean = clean[: mb * acc].reshape(acc, mb, *clean.shape[1:])
        keys = jax.random.split(key, acc)

        def body(acc, xs):
            loss_sum, grad_sum = acc
            k, mb_noisy, mb_clean = xs
            loss, grads = grad_fn(state.params, k, mb_noisy, mb_clean)
            return (loss_sum + loss, jax.tree_util.tree_map(jnp.add, grad_sum, grads)), None

        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (loss_sum, grads), _ = jax.lax.scan(body, (jnp.zeros(()), zero), (keys, noisy, clean))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=new_params, opt_state=new_opt, step=state.step + 1),
            loss_sum / acc,
        )

    return step


@dataclasses.dataclass
class DiffusionTrainer(ShardedTrainerMixin):
    """Driver mirroring ``train(args)`` (diffusion_RDUnet.py:230-288)."""

    base_filters: int = 32
    timesteps: int = 20
    optimizer_choice: str = "adamw"
    scheduler_choice: str = "step"
    lr: float = 1e-4
    weight_decay: float = 1e-4
    distribution_choice: str = "uniform"
    # (mse, charbonnier, ssim) weights of combined_loss — the reference's own
    # tuning knobs (diffusion_RDUnet.py:60-65, defaults 0/1/0)
    loss_weights: tuple = (0.0, 1.0, 0.0)
    sampling: str = "improved"  # 'improved' (T-step) or 'direct' (t=1 ablation, C12)
    accumulation_steps: int = 4
    clip_norm: float = 0.1
    output_dir: str = "checkpoints"
    compute_dtype: Any = jnp.float32
    mesh: Any = None
    writer: Any = None
    # U-Net execution engine: 'flax' (reference-exact conv order — strict parity),
    # 'xla' (optimized engine, natively differentiable, fastest on hardware),
    # 'pallas' (fused kernels via custom VJP — small-batch latency)
    engine: str = "flax"
    # rematerialize dense blocks in the backward pass (HBM relief; models/rdunet.py)
    remat: bool = False
    # 'replicated', 'fsdp' (params + Adam moments sharded over the data axis,
    # ZeRO-style; parallel/fsdp.py), or 'tp' (channel tensor parallelism over a
    # 'model' axis; parallel/tp.py — splits each layer's compute, for batches
    # too small to shard over data, e.g. the batch-8 T=20 sampler)
    param_sharding: str = "replicated"

    def __post_init__(self):
        self.unet = RDUNetT(base_filters=self.base_filters, remat=self.remat)
        self.diffusion = InterpolationDiffusion(timesteps=self.timesteps)
        if self.engine == "flax":
            self._unet_apply = self.unet.apply
        else:
            from ..models.fused_apply import rdunet_t_apply_fused

            self._unet_apply = lambda p, x, t: rdunet_t_apply_fused(
                p, x, t, engine=self.engine, trainable=(self.engine == "pallas"),
                remat=self.remat,
            )

    def init(self, key, sample_noisy, steps_per_epoch: int):
        self.ensure_mesh()
        self.steps_per_epoch = max(1, steps_per_epoch)
        n = sample_noisy.shape[0]
        self.tx = make_optimizer(
            self.optimizer_choice,
            lr=self.lr,
            weight_decay=self.weight_decay,
            scheduler_choice=self.scheduler_choice,
            steps_per_epoch=max(1, steps_per_epoch),
            clip_norm=self.clip_norm,
        )
        state = self._make_state(self.unet.init, key, sample_noisy, jnp.zeros((n,)))
        step = make_diffusion_train_step(
            self._unet_apply,
            self.diffusion,
            self.tx,
            accumulation_steps=self.accumulation_steps,
            distribution=self.distribution_choice,
            loss_weights=tuple(self.loss_weights),
            compute_dtype=self.compute_dtype,
        )
        self._jit_step = jax.jit(step, donate_argnums=(0,))
        if self.sampling == "direct":
            sample_fn = self.diffusion.direct_sampling
        else:
            sample_fn = self.diffusion.improved_sampling
        self._jit_sample = jax.jit(
            lambda params, noisy: sample_fn(
                self._unet_apply, params, noisy
            )
        )
        return state

    def batch_sharding(self):
        return shard_batch(self.ensure_mesh())

    def train_epoch(self, state, train_loader, key, epoch: int):
        losses = []
        for batch_idx, (noisy, clean) in enumerate(train_loader):
            k = jax.random.fold_in(jax.random.fold_in(key, epoch), batch_idx)
            state, loss = self._jit_step(state, k, noisy, clean)
            losses.append(loss)
            if self.writer is not None:
                self.writer.add_scalar(
                    "Loss/train", float(loss), epoch * len(train_loader) + batch_idx
                )
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        return state, mean_loss

    def validate(self, state, val_loader, epoch: int):
        """Full improved_sampling on one val batch (diffusion_RDUnet.py:137-144)."""
        it = iter(val_loader)
        try:
            noisy, clean = next(it)
        except StopIteration:
            return float("nan"), None
        denoised = self._jit_sample(state.params, noisy.astype(self.compute_dtype))
        vloss = float(combined_loss(denoised.astype(jnp.float32), clean.astype(jnp.float32)))
        if self.writer is not None:
            self.writer.add_scalar("Loss/validation", vloss, epoch + 1)
            # per-epoch image grids (diffusion_RDUnet.py:146-159; first 10 images)
            from ..data.device import denormalize as denorm
            from ..utils.tb import add_image_grid

            for tag, imgs in (
                (f"Epoch_{epoch + 1}/Clean Images", clean),
                (f"Epoch_{epoch + 1}/Noisy Images", noisy),
                (f"Epoch_{epoch + 1}/Denoised Images", denoised),
            ):
                add_image_grid(
                    self.writer, tag,
                    np.asarray(denorm(jnp.asarray(imgs[:10], jnp.float32))),
                    epoch + 1,
                )
        return vloss, denoised

    def save_epoch_checkpoint(self, state, epoch: int, name: str = ""):
        """``name`` overrides the reference filename — mid-run insurance saves
        use a ``mid_``-prefixed name that the manifest's liveness glob
        (``diffusion_RDUNet_model_checkpointed_epoch_*.pth``) does not match,
        so an interrupted run is never mistaken for the completed artifact."""
        path = os.path.join(
            self.output_dir,
            name or f"diffusion_RDUNet_model_checkpointed_epoch_{epoch + 1}.pth",
        )
        ckpt_io.save_pth(
            path,
            state.params,
            epoch=epoch + 1,
            prefix="unet.",
            extra={
                # reference layout keys (diffusion_RDUnet.py:172-177); optax state rides
                # along as flattened torch tensors so our own resume is exact AND the
                # file stays loadable under torch.load's safe weights-only default
                "optimizer_state_dict": {},
                "scheduler_state_dict": {},
                "optax_leaves": ckpt_io.optax_state_to_safe(state.opt_state),
            },
        )
        # native orbax sidecar: the full train state (params + optax state + step),
        # atomic and layout-exact, for resume without the torch interop round-trip;
        # saved shard-native (no gather — each process writes only its shards)
        ckpt_io.save_orbax(path + ".orbax", state)
        return path

    def load_checkpoint(self, state, checkpoint_path: Optional[str]):
        """Resume (diffusion_RDUnet.py:180-193): returns (state, start_epoch);
        silently starts at epoch 0 if the file is missing, like the reference."""
        if checkpoint_path is None or not os.path.isfile(checkpoint_path):
            print(f"No checkpoint found at '{checkpoint_path}'")
            return state, 0
        if os.path.isdir(checkpoint_path + ".orbax"):
            # exact resume from the native sidecar (full state, no torch round-trip)
            state, start_epoch = self._resume_from_sidecar(state, checkpoint_path)
            print(f"Loaded orbax sidecar '{checkpoint_path}.orbax' (epoch {start_epoch})")
            return state, start_epoch
        params, payload = ckpt_io.load_pth(
            checkpoint_path, state.params, prefix="unet.", allow_pickle=True
        )
        start_epoch = int(payload.get("epoch", 0)) if payload else 0
        resume_step = start_epoch * getattr(self, "steps_per_epoch", 1)
        state = TrainState(
            params=params,
            opt_state=self._resume_opt_state(state.opt_state, payload, resume_step),
            step=jnp.asarray(resume_step, jnp.int32),
        )
        state = self._put_state(state)
        print(f"Loaded checkpoint '{checkpoint_path}' (epoch {start_epoch})")
        return state, start_epoch

    def fit(self, state, train_loader, val_loader, num_epochs: int, start_epoch: int = 0,
            key: Optional[jax.Array] = None):
        from ..utils.preempt import GracefulShutdown

        key = key if key is not None else jax.random.PRNGKey(0)
        history = []
        # SIGTERM/SIGINT (pool preemption) finishes the epoch, checkpoints, exits
        with GracefulShutdown() as stop:
            for epoch in range(start_epoch, num_epochs):
                t0 = time.time()
                state, loss = self.train_epoch(state, train_loader, key, epoch)
                vloss, _ = self.validate(state, val_loader, epoch)
                self.save_epoch_checkpoint(state, epoch)
                history.append(
                    {"epoch": epoch, "loss": loss, "val_loss": vloss, "sec": time.time() - t0}
                )
                print(
                    f"Epoch [{epoch + 1}/{num_epochs}], Loss: {loss:.4f}, "
                    f"Validation Loss: {vloss:.4f} ({history[-1]['sec']:.1f}s)"
                )
                if stop.requested:
                    print(f"[preempt] checkpointed through epoch {epoch + 1}; stopping")
                    break
        return state, history


def build_arg_parser() -> argparse.ArgumentParser:
    """CLI flag parity with diffusion_RDUnet.py:292-311."""
    p = argparse.ArgumentParser(
        description="Train a diffusion model with optional optimizer and scheduler choice."
    )
    p.add_argument("--dataset_choice", type=str, default="SIDD", choices=["DIV2K", "SIDD"])
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--num_epochs", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--validation_split", type=float, default=0.2)
    p.add_argument("--augment", action="store_false")
    p.add_argument("--dataset_percentage", type=float, default=0.1)
    p.add_argument("--base_filters", type=int, default=32)
    p.add_argument("--timesteps", type=int, default=20)
    p.add_argument("--optimizer_choice", type=str, default="adamw",
                   choices=["adam", "adamw", "adadelta"])
    p.add_argument("--scheduler_choice", type=str, default="step", choices=["cosine", "step"])
    p.add_argument("--output_dir", type=str, default="checkpoints")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--distribution_choice", type=str, default="uniform",
                   choices=["uniform", "biased"])
    p.add_argument("--loss_weights", type=str, default="0,1,0",
                   help="mse,charbonnier,ssim weights of combined_loss "
                        "(diffusion_RDUnet.py:60-65 defaults 0,1,0)")
    # TPU-native extras (no reference counterpart)
    p.add_argument("--data_root", type=str, default="dataset",
                   help="root containing DIV2K_train_HR.nosync / SIDD_dataset.nosync")
    p.add_argument("--bf16", action="store_true", help="run the U-Net in bfloat16")
    p.add_argument("--engine", type=str, default="flax",
                   choices=["flax", "xla", "pallas"],
                   help="U-Net engine: flax (reference-exact), xla (optimized, "
                        "fastest), pallas (fused kernels, small-batch latency)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize dense blocks in backward (fits larger "
                        "batches in HBM)")
    p.add_argument("--param-sharding", type=str, default="replicated",
                   choices=["replicated", "fsdp", "tp"],
                   help="fsdp shards params + Adam moments over the data mesh "
                        "axis (ZeRO; parallel/fsdp.py) — frees replicated-state "
                        "HBM on slices/pods; tp shards each layer's channels "
                        "over a 'model' axis (parallel/tp.py) — compute "
                        "parallelism for batches too small to shard over data")
    p.add_argument("--device-data", action="store_true",
                   help="keep the deduped uint8 patch bank resident in HBM and "
                        "sample/degrade batches on device (data/resident.py) — "
                        "removes the per-step host->device transfer bottleneck; "
                        "DIV2K only")
    return p


def load_data_for(args, sharding=None):
    """Dataset dispatch (diffusion_RDUnet.py:222-228)."""
    from ..data.loader import load_data as load_div2k_data
    from ..data.loader import load_sidd_data

    device_data = getattr(args, "device_data", False)
    if args.dataset_choice == "DIV2K":
        folder = os.path.join(args.data_root, "DIV2K_train_HR.nosync")
        return load_div2k_data(
            folder, batch_size=args.batch_size, augment=args.augment,
            dataset_percentage=args.dataset_percentage,
            validation_split=args.validation_split, use_rgb=True,
            num_workers=args.num_workers, sharding=sharding,
            device_data=device_data,
        )
    if device_data:
        raise ValueError("--device-data currently supports DIV2K only (the "
                         "SIDD pair bank would double the HBM footprint)")
    folder = os.path.join(args.data_root, "SIDD_dataset.nosync", "SIDD_Medium_Srgb")
    return load_sidd_data(
        folder, batch_size=args.batch_size, augment=args.augment,
        dataset_percentage=args.dataset_percentage,
        validation_split=args.validation_split, use_rgb=True,
        num_workers=args.num_workers, sharding=sharding,
    )


def train(args, train_loader=None, val_loader=None):
    """Full training entry point (diffusion_RDUnet.py:230-288)."""
    print(ASCII_BANNER)
    for k, v in sorted(vars(args).items()):
        print(f"{k}: {v}")

    loss_weights = getattr(args, "loss_weights", None) or (0.0, 1.0, 0.0)
    if isinstance(loss_weights, str):
        loss_weights = tuple(float(w) for w in loss_weights.split(","))
    trainer = DiffusionTrainer(
        base_filters=args.base_filters,
        timesteps=args.timesteps,
        optimizer_choice=args.optimizer_choice,
        scheduler_choice=args.scheduler_choice,
        lr=args.lr,
        weight_decay=args.weight_decay,
        distribution_choice=args.distribution_choice,
        loss_weights=loss_weights,
        output_dir=args.output_dir,
        compute_dtype=jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32,
        engine=getattr(args, "engine", "flax"),
        remat=getattr(args, "remat", False),
        param_sharding=getattr(args, "param_sharding", "replicated"),
    )
    try:
        from tensorboardX import SummaryWriter

        log_dir = os.path.join("runs", "diffusion_checkpointed",
                               os.path.basename(args.output_dir))
        trainer.writer = SummaryWriter(log_dir=log_dir)
    except ImportError:
        pass

    if train_loader is None or val_loader is None:
        # data-parallel infeed: batches land on the mesh already sharded on 'data',
        # so the jitted step's gradient all-reduce rides ICI with no host gather
        train_loader, val_loader = load_data_for(args, sharding=trainer.batch_sharding())

    sample = next(iter(val_loader))[0]
    state = trainer.init(jax.random.PRNGKey(0), sample, steps_per_epoch=len(train_loader))
    state, start_epoch = trainer.load_checkpoint(state, args.checkpoint_path)
    state, history = trainer.fit(
        state, train_loader, val_loader, args.num_epochs, start_epoch=start_epoch
    )

    final_path = os.path.join(args.output_dir, "diffusion_RDUNet_model_checkpointed_final.pth")
    ckpt_io.save_pth(final_path, state.params, prefix="unet.", bare=True)
    print(f"Final model saved at {final_path}")
    return state, history


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    # multi-host bootstrap (no-op unless JAX_COORDINATOR_ADDRESS is configured);
    # must run before the first jax.devices() touch
    from ..parallel.mesh import init_distributed
    from ..utils.cache import enable_compilation_cache

    init_distributed()
    enable_compilation_cache()  # persistent XLA compile cache across runs
    try:
        return train(args)
    except Exception as e:  # mirror the reference's top-level guard (:314-315)
        print(f"An error occurred: {e}")
        raise


if __name__ == "__main__":
    main()
