"""Interpolation-style diffusion for image denoising, TPU-native.

Reference: ``DiffusionModel`` in diffusion_denoising/diffusion_RDUnet.py:27-55.  This is
NOT a DDPM noise process: the forward process linearly interpolates clean -> noisy with
alpha = t/T, and the reverse sampler runs T steps, each using two U-Net predictions (at
t and t-1, both evaluated on the current x_t) with the update
``x_t <- x_t - x_tilde_t + x_tilde_{t-1}``.

TPU-first redesign of the sampler (SURVEY.md §3.2): the reference's Python loop with 2
sequential U-Net calls per step (40 forwards at T=20, one image at a time) becomes a
single jitted ``lax.scan`` whose body makes ONE U-Net call on a 2N-stacked batch
(the two calls share x_t and differ only in the timestep plane), so the MXU sees batches
twice as large and the step count halves the sequential depth.
"""

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class InterpolationDiffusion:
    """Functional port of the reference DiffusionModel (timesteps default 20)."""

    timesteps: int = 20

    def forward_diffusion(self, clean, noisy, t):
        """alpha*noisy + (1-alpha)*clean with alpha = t/T (diffusion_RDUnet.py:33-36).

        ``t`` may be a scalar or a per-image (N,) vector of *unnormalized* timesteps in
        [0, T].
        """
        alpha = jnp.asarray(t, clean.dtype) / self.timesteps
        if alpha.ndim == 1:
            alpha = alpha.reshape(-1, 1, 1, 1)
        return alpha * noisy + (1 - alpha) * clean

    def improved_sampling(self, unet_apply, params, noisy, unroll=1):
        """T-step reverse sampler (diffusion_RDUnet.py:38-50) as one lax.scan.

        unet_apply(params, x, t_normalized) -> prediction; ``t_normalized`` is a (N,)
        vector.  Each scan step evaluates the U-Net once on the (2N)-stacked batch
        [x_t; x_t] with timesteps [t/T; (t-1)/T] — identical math to the reference's two
        sequential calls.
        """
        n = noisy.shape[0]
        ts = jnp.arange(self.timesteps, 0, -1, dtype=noisy.dtype)  # T..1

        def step(x_t, t):
            alpha_t = t / self.timesteps
            alpha_prev = (t - 1) / self.timesteps
            x2 = jnp.concatenate([x_t, x_t], axis=0)
            t2 = jnp.concatenate(
                [jnp.full((n,), alpha_t, noisy.dtype), jnp.full((n,), alpha_prev, noisy.dtype)]
            )
            pred2 = unet_apply(params, x2, t2)
            pred_t, pred_prev = pred2[:n], pred2[n:]
            x_tilde = (1 - alpha_t) * pred_t + alpha_t * noisy
            x_tilde_prev = (1 - alpha_prev) * pred_prev + alpha_prev * noisy
            return x_t - x_tilde + x_tilde_prev, None

        x_final, _ = jax.lax.scan(step, noisy, ts, unroll=unroll)
        return x_final

    def improved_sampling_sequential(self, unet_apply, params, noisy):
        """Literal two-call-per-step variant (for parity checks against the batched one)."""
        n = noisy.shape[0]
        ts = jnp.arange(self.timesteps, 0, -1, dtype=noisy.dtype)

        def step(x_t, t):
            alpha_t = t / self.timesteps
            alpha_prev = (t - 1) / self.timesteps
            pred_t = unet_apply(params, x_t, jnp.full((n,), alpha_t, noisy.dtype))
            x_tilde = (1 - alpha_t) * pred_t + alpha_t * noisy
            pred_prev = unet_apply(params, x_t, jnp.full((n,), alpha_prev, noisy.dtype))
            x_tilde_prev = (1 - alpha_prev) * pred_prev + alpha_prev * noisy
            return x_t - x_tilde + x_tilde_prev, None

        x_final, _ = jax.lax.scan(step, noisy, ts)
        return x_final

    def direct_sampling(self, unet_apply, params, noisy):
        """Single U-Net call at t=1.0 (ablation; diffusion_RDUnet_direct.py:198-201)."""
        n = noisy.shape[0]
        return unet_apply(params, noisy, jnp.full((n,), 1.0, noisy.dtype))
