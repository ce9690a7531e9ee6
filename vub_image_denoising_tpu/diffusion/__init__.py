from .interpolation import InterpolationDiffusion
from .losses import charbonnier_loss, combined_loss, ssim
