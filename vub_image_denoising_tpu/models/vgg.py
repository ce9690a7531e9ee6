"""VGG19 feature extractor for perceptual losses.

The reference uses ``torchvision.models.vgg19(weights=IMAGENET1K_V1).features[:N]``
(paper_gan.py:203-216, default N=8; train_denoising_gan.py:114-126).  VGG19 features
layers 0..7 are: Conv(3,64) ReLU Conv(64,64) ReLU MaxPool Conv(64,128) ReLU
Conv(128,128) — i.e. features[:8] output is the second 128-channel conv, pre-ReLU.

This environment has no torchvision and no network egress, so pretrained ImageNet
weights are not available by default.  ``VGG19Features`` reproduces the architecture
exactly; ``load_torch_vgg19`` fills it from a torchvision-format ``vgg19`` state_dict
(.pth) if the user provides one (env var ``VGG19_WEIGHTS`` or explicit path).  Without
weights it falls back to the module's kaiming init — a random-feature perceptual loss
(documented deviation; swap in real weights for paper-exact training).
"""

import os
from typing import Optional

import jax

from ..utils.checkpoint import load_torch_payload as _load_torch_payload
import jax.numpy as jnp
from flax import linen as nn

from ..nn.torch_layers import TorchConv, max_pool_2x2

# (layer_index_in_torchvision_features, out_channels) for each conv, in order, plus the
# positions of ReLU/pool, for the first 8 layers and beyond (full features has 16 convs)
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _torch_layer_indices():
    """Map conv order -> torchvision features index (convs are at 0,2,5,7,10,...)."""
    idx, out = 0, []
    for c in _VGG19_CFG:
        if c == "M":
            idx += 1
        else:
            out.append(idx)
            idx += 2  # conv + relu
    return out


class VGG19Features(nn.Module):
    """First ``num_layers`` entries of torchvision vgg19().features."""

    num_layers: int = 8

    @nn.compact
    def __call__(self, x):
        """x: NHWC float.  Grayscale inputs are channel-repeated to 3 like the
        reference (paper_gan.py:210-214)."""
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        layer = 0
        conv_i = 0
        for c in _VGG19_CFG:
            if layer >= self.num_layers:
                break
            if c == "M":
                x = max_pool_2x2(x)
                layer += 1
            else:
                x = TorchConv(c, 3, 1, 1, name=f"conv{conv_i}")(x)
                conv_i += 1
                layer += 1
                if layer >= self.num_layers:
                    break
                x = nn.relu(x)
                layer += 1
        return x


def load_torch_vgg19(params_template, path: Optional[str] = None, num_layers: int = 8):
    """Fill a VGG19Features param tree from a torchvision vgg19 state_dict .pth.

    Returns None if no weights file is available.
    """
    path = path or os.environ.get("VGG19_WEIGHTS")
    if not path or not os.path.isfile(path):
        return None
    import numpy as np
    import torch

    sd = _load_torch_payload(path)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    tree = dict(params_template["params"])
    torch_idx = _torch_layer_indices()
    for i, name in enumerate(sorted(tree, key=lambda s: int(s.replace("conv", "")))):
        ti = torch_idx[int(name.replace("conv", ""))]
        w = np.asarray(sd[f"features.{ti}.weight"])  # OIHW
        b = np.asarray(sd[f"features.{ti}.bias"])
        tree[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return {"params": tree}
