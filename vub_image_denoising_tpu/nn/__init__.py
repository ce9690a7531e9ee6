from .layers import PReLU, Conv3x3, Downsample2x2, Upsample2x2
from .blocks import InputBlock, OutputBlock, DenoisingBlock, DownsampleBlock, UpsampleBlock
