from .metrics import psnr, ssim_ref, mse
