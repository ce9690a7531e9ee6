"""Standalone training presets mirroring the reference's hardcoded __main__ scripts.

The reference duplicates the diffusion trainer into four files that differ only in
config (SURVEY.md code-duplication note); here each is a preset over the ONE
DiffusionTrainer:

- ``main_diffusion_rdunet``       — diffusion_denoising/main_diffusion_RDUnet.py:361-387:
  astro/DIV2K-style folder dataset, batch 8, base_filters 32, Adam(2e-4) +
  CosineAnnealingLR(T_max=10), 300 epochs, optional resume (the reference resumes from
  ``model_epoch_899.pth``).
- ``main_diffusion_rdunet_sidd``  — main_diffusion_RDUnet_SIDD.py:361-382: same with the
  SIDD loader and dataset_percentage 0.1.
- ``diffusion_rdunet_direct``     — diffusion_RDUnet_direct.py:352-373: same trainer but
  validation/inference uses single-call direct sampling at t=1 (:187-206).
- ``rdunet_supervised_main``      — UNet/RDUNet_model.py:270-283: RDUNet(128) supervised
  on DIV2K 10%, batch 4, 21 epochs, AdamW(1e-4, wd 1e-5), StepLR(3, 0.5), accum 4.
"""

from typing import Optional

import jax

from ..data.loader import load_data as load_folder_data
from ..data.loader import load_sidd_data
from .diffusion import DiffusionTrainer
from .supervised import SupervisedTrainer


def _run_diffusion(trainer: DiffusionTrainer, train_loader, val_loader,
                   num_epochs: int, checkpoint_path: Optional[str] = None):
    sample = next(iter(val_loader))[0]
    state = trainer.init(jax.random.PRNGKey(0), sample, steps_per_epoch=len(train_loader))
    state, start_epoch = trainer.load_checkpoint(state, checkpoint_path)
    return trainer.fit(state, train_loader, val_loader, num_epochs, start_epoch=start_epoch)


def main_diffusion_rdunet(image_folder: str, num_epochs: int = 300,
                          checkpoint_path: Optional[str] = None,
                          output_dir: str = "checkpoints", batch_size: int = 8):
    """main_diffusion_RDUnet.py config: Adam(2e-4) + cosine(T_max 10), base 32, T=20."""
    trainer = DiffusionTrainer(
        base_filters=32, timesteps=20, optimizer_choice="adam",
        scheduler_choice="cosine", lr=2e-4, output_dir=output_dir,
    )
    train_loader, val_loader = load_folder_data(
        image_folder, batch_size=batch_size, use_rgb=True, dataset_percentage=1.0,
        sharding=trainer.batch_sharding(),
    )
    return _run_diffusion(trainer, train_loader, val_loader, num_epochs, checkpoint_path)


def main_diffusion_rdunet_sidd(root_folder: str, num_epochs: int = 300,
                               checkpoint_path: Optional[str] = None,
                               output_dir: str = "checkpoints", batch_size: int = 8):
    """main_diffusion_RDUnet_SIDD.py config: SIDD pairs, dataset_percentage 0.1."""
    trainer = DiffusionTrainer(
        base_filters=32, timesteps=20, optimizer_choice="adam",
        scheduler_choice="cosine", lr=2e-4, output_dir=output_dir,
    )
    train_loader, val_loader = load_sidd_data(
        root_folder, batch_size=batch_size, use_rgb=True, dataset_percentage=0.1,
        sharding=trainer.batch_sharding(),
    )
    return _run_diffusion(trainer, train_loader, val_loader, num_epochs, checkpoint_path)


def diffusion_rdunet_direct(image_folder: str, num_epochs: int = 300,
                            checkpoint_path: Optional[str] = None,
                            output_dir: str = "checkpoints", batch_size: int = 8):
    """diffusion_RDUnet_direct.py: single-call t=1 sampling ablation (:187-206)."""
    trainer = DiffusionTrainer(
        base_filters=32, timesteps=20, optimizer_choice="adam",
        scheduler_choice="cosine", lr=2e-4, output_dir=output_dir, sampling="direct",
    )
    train_loader, val_loader = load_folder_data(
        image_folder, batch_size=batch_size, use_rgb=True, dataset_percentage=1.0,
        sharding=trainer.batch_sharding(),
    )
    return _run_diffusion(trainer, train_loader, val_loader, num_epochs, checkpoint_path)


def rdunet_supervised_main(image_folder: str, num_epochs: int = 21,
                           batch_size: int = 4, fast: bool = False):
    """UNet/RDUNet_model.py __main__: RDUNet(128), DIV2K 10%, AdamW, 21 epochs.

    ``fast=True`` switches geometry to the measured v5e sweet spot (BASELINE.md):
    the optimized-XLA engine with dense-block remat, bf16 compute, batch 8 per
    chip.  NOTE this grows the per-update batch from the reference's 4 to
    8 x n_devices (throughput-optimized, NOT bit-parity with the reference run
    — consider scaling ``lr`` with the batch); optimizer and schedule semantics
    are otherwise unchanged.
    """
    import jax.numpy as jnp

    from ..models.rdunet import RDUNet

    if fast:
        batch_size = max(batch_size, 8 * len(jax.devices()))
    trainer = SupervisedTrainer(
        RDUNet(channels=3, base_filters=128), lr=1e-4, weight_decay=1e-5,
        accumulation_steps=4, checkpoint_every=5,
        engine="xla" if fast else "flax", remat=fast,
        compute_dtype=jnp.bfloat16 if fast else jnp.float32,
    )
    train_loader, val_loader = load_folder_data(
        image_folder, batch_size=batch_size, augment=False, dataset_percentage=0.1,
        use_rgb=True, sharding=trainer.batch_sharding(),
    )
    sample = next(iter(val_loader))[0]
    state = trainer.init(jax.random.PRNGKey(0), sample, steps_per_epoch=len(train_loader))
    return trainer.fit(state, train_loader, num_epochs, val_loader=val_loader)
