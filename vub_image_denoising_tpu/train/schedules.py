"""LR schedules and optimizer factories matching the reference's torch semantics.

- ``step_lr``            — torch StepLR(step_size, gamma) stepped once per EPOCH
  (RDUNet_model.py:193-195: step_size=3, gamma=0.5; diffusion_RDUnet.py:269-271).
- ``cosine_annealing_lr``— torch CosineAnnealingLR(T_max=10, eta_min=0) stepped per
  epoch (diffusion_RDUnet.py:266).
- ``make_optimizer``     — the reference's optimizer menu (diffusion_RDUnet.py:264-276):
  adam (betas 0.9/0.999, cosine), adamw (wd, StepLR(3, .5)), adadelta (StepLR(3, .5));
  global-norm gradient clipping composed in front (torch clip_grad_norm_ analog).

Schedules are functions of the global step; epoch granularity is reproduced via
``steps_per_epoch`` (the reference calls scheduler.step() once per epoch).
"""

import math
from typing import Optional

import jax.numpy as jnp
import optax


def step_lr(base_lr: float, steps_per_epoch: int, step_size: int = 3, gamma: float = 0.5):
    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * (gamma ** (epoch // step_size))

    return schedule


def cosine_annealing_lr(
    base_lr: float, steps_per_epoch: int, t_max: int = 10, eta_min: float = 0.0
):
    def schedule(step):
        # jnp.cos, not math.cos: optax evaluates the schedule on the TRACED
        # step counter inside the jitted train step — math.cos would force a
        # concretization error for every adam/cosine config
        epoch = step // steps_per_epoch
        return eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(math.pi * (epoch % (2 * t_max)) / t_max)
        ) / 2

    return schedule


def make_optimizer(
    optimizer_choice: str = "adamw",
    lr: float = 1e-4,
    weight_decay: float = 1e-4,
    scheduler_choice: Optional[str] = None,
    steps_per_epoch: int = 1,
    clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the reference's optimizer+scheduler combination as one optax chain."""
    if scheduler_choice is None:
        scheduler_choice = "cosine" if optimizer_choice == "adam" else "step"
    if scheduler_choice == "cosine":
        schedule = cosine_annealing_lr(lr, steps_per_epoch)
    else:
        schedule = step_lr(lr, steps_per_epoch)

    if optimizer_choice == "adam":
        tx = optax.adam(schedule, b1=0.9, b2=0.999)
    elif optimizer_choice == "adamw":
        # torch AdamW decays every param (incl. biases/PReLU) scaled by lr — same as optax
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    elif optimizer_choice == "adadelta":
        tx = optax.adadelta(schedule)
    else:
        raise ValueError(f"unknown optimizer '{optimizer_choice}'")

    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def fast_forward_opt_state(opt_state, step_count: int):
    """Fast-forward the LR-schedule position of an optax state to ``step_count``.

    Used when resuming from a reference-written .pth that carries epoch +
    ``scheduler_state_dict`` but no optax payload: the reference restores ONLY
    the torch scheduler position (diffusion_RDUnet.py:186-189) — its fresh Adam
    restarts at t=0 with full bias correction.  We therefore overwrite only the
    ``ScaleByScheduleState`` counters (the LR position) and leave the optimizer
    counters (e.g. ``ScaleByAdamState.count``) at zero: fast-forwarding Adam's
    count while its moment buffers are zero would skip bias correction and make
    the first post-resume update ~(1-b1)/sqrt(1-b2) ≈ 3x too large."""
    import jax.numpy as jnp

    def ff(node):
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            if type(node).__name__ == "ScaleByScheduleState":
                return node._replace(
                    count=jnp.asarray(step_count, node.count.dtype)
                )
            return type(node)(*(ff(c) for c in node))
        if isinstance(node, tuple):
            return tuple(ff(c) for c in node)
        if isinstance(node, list):
            return [ff(c) for c in node]
        if isinstance(node, dict):
            return {k: ff(v) for k, v in node.items()}
        return node

    return ff(opt_state)
