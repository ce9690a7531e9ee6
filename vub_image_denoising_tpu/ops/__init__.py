from .fused_block import fused_denoising_block

from . import bm3d  # noqa: F401  (native BM3D baseline: ops/bm3d.py)
