from .fused_block import fused_denoising_block
