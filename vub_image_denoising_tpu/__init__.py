"""vub_image_denoising_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-denoising framework.

A brand-new framework with the full capabilities of the PyTorch reference
``pierregab/VUB_Image_denoising`` (see SURVEY.md for the complete map):

- ``models``    — RDUNet / RDUNet_T residual-dense U-Nets, RCA-GAN, attention-U-Net GAN
                  (reference: UNet/RDUNet_model.py, diffusion_denoising/Unet/Unet_model.py,
                  __pycache__/paper_gan.pyc, __pycache__/train_denoising_gan.pyc)
- ``diffusion`` — interpolation-diffusion process + T-step reverse sampler as one jitted
                  lax.scan (reference: diffusion_denoising/diffusion_RDUnet.py:27-55)
- ``data``      — patch datasets for DIV2K-style folders and SIDD pairs with on-device
                  fused Gaussian-noise injection (reference: dataset_creation/)
- ``train``     — supervised / diffusion / GAN trainers as pure jitted steps sharded over
                  a jax.sharding.Mesh (reference: single-device loops)
- ``eval``      — PSNR/SSIM/PSD metric suite, SIDD .mat evaluation, Kaggle CSV emission,
                  figure library (reference: evaluate_SIDD/, evaluate_Unet_diffusion/)
- ``ops``       — Pallas TPU kernels and MXU-friendly rearrangement ops
- ``parallel``  — mesh bootstrap and sharding helpers (greenfield; reference is 1-device)
"""

__version__ = "0.1.0"


def enable_strict_precision():
    """Force exact-f32 matmuls/convs for unspecified-precision ops.

    This JAX build lowers default-precision float32 convolutions through a reduced
    (~bf16) path even on CPU — up to ~1% output error vs torch.  Parity-critical
    evaluation (the 0.05 dB PSNR budget, BASELINE.md) must run with this enabled;
    bfloat16 inputs keep their fast MXU path.
    """
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
