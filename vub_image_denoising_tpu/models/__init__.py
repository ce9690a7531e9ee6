from .rdunet import RDUNet, RDUNetT
