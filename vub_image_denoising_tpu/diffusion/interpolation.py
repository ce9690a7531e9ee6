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
        in_dtype = noisy.dtype
        # Schedule and update arithmetic stay f32 regardless of activation dtype:
        # bf16 cannot represent integers > 256 (whole t steps collapse at large T)
        # and t/T rounds alphas by ~0.4% even at T=20.  Only the U-Net INPUTS are
        # cast to the activation dtype — the model still runs bf16-fast while the
        # sampler state x_t accumulates exactly (elementwise f32 is noise next to
        # the 2N forward).
        ts = jnp.arange(self.timesteps, 0, -1, dtype=jnp.float32)  # T..1
        noisy32 = noisy.astype(jnp.float32)

        def step(x_t, t):
            alpha_t = t / self.timesteps
            alpha_prev = (t - 1) / self.timesteps
            x2 = jnp.concatenate([x_t, x_t], axis=0).astype(in_dtype)
            t2 = jnp.concatenate(
                [jnp.full((n,), alpha_t), jnp.full((n,), alpha_prev)]
            ).astype(in_dtype)
            pred2 = unet_apply(params, x2, t2).astype(jnp.float32)
            pred_t, pred_prev = pred2[:n], pred2[n:]
            x_tilde = (1 - alpha_t) * pred_t + alpha_t * noisy32
            x_tilde_prev = (1 - alpha_prev) * pred_prev + alpha_prev * noisy32
            return x_t - x_tilde + x_tilde_prev, None

        x_final, _ = jax.lax.scan(step, noisy32, ts, unroll=unroll)
        return x_final.astype(in_dtype)

    def improved_sampling_sequential(self, unet_apply, params, noisy):
        """Literal two-call-per-step variant (for parity checks against the batched one)."""
        n = noisy.shape[0]
        in_dtype = noisy.dtype
        ts = jnp.arange(self.timesteps, 0, -1, dtype=jnp.float32)  # f32: see above
        noisy32 = noisy.astype(jnp.float32)

        def step(x_t, t):
            alpha_t = t / self.timesteps
            alpha_prev = (t - 1) / self.timesteps
            xin = x_t.astype(in_dtype)
            pred_t = unet_apply(
                params, xin, jnp.full((n,), alpha_t).astype(in_dtype)
            ).astype(jnp.float32)
            x_tilde = (1 - alpha_t) * pred_t + alpha_t * noisy32
            pred_prev = unet_apply(
                params, xin, jnp.full((n,), alpha_prev).astype(in_dtype)
            ).astype(jnp.float32)
            x_tilde_prev = (1 - alpha_prev) * pred_prev + alpha_prev * noisy32
            return x_t - x_tilde + x_tilde_prev, None

        x_final, _ = jax.lax.scan(step, noisy32, ts)
        return x_final.astype(in_dtype)

    def forward(self, unet_apply, params, clean, noisy, t, unroll=1):
        """Forward-diffuse then fully re-sample (diffusion_RDUnet.py:52-55).

        The reference's ``DiffusionModel.forward`` composes
        ``forward_diffusion(clean, noisy, t)`` with ``improved_sampling`` applied
        to the *interpolated* image — i.e. the interpolation acts as BOTH the
        sampler's starting point x_T and its per-step anchor (the reference
        passes it as improved_sampling's ``noisy_image``).
        """
        interpolated = self.forward_diffusion(clean, noisy, t)
        return self.improved_sampling(unet_apply, params, interpolated, unroll=unroll)

    def direct_sampling(self, unet_apply, params, noisy):
        """Single U-Net call at t=1.0 (ablation; diffusion_RDUnet_direct.py:198-201)."""
        n = noisy.shape[0]
        return unet_apply(params, noisy, jnp.full((n,), 1.0, noisy.dtype))
