from .rdunet import RDUNet, RDUNetT
from .fused_apply import rdunet_apply_fused, rdunet_t_apply_fused, prepare_fused_params
from .rca_gan import Generator as RCAGenerator, Discriminator as RCADiscriminator
from .attention_unet import AttentionUNet, PatchGAN
from .experimental import GaussianDiffusion, GeneratorWithDiffusion, SmallUNet, UNetS
from .vgg import VGG19Features
