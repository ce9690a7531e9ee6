"""Perceptual metrics: LPIPS (AlexNet) and DISTS, JAX-native.

The reference's comparative suite uses ``lpips.LPIPS(net='alex')`` and
``DISTS_pytorch.DISTS`` (evaluate_Unet_diffusion/evaluate_model.py:79-80) on [-1,1]
3-channel tensors.  Those packages and their pretrained weights are not available in
this environment (no egress), so:

- the architectures are reproduced exactly (AlexNet-features taps for LPIPS; VGG16
  stages with structure/texture statistics for DISTS);
- ``load_lpips_torch`` / ``load_dists_torch`` fill parameters from the original
  packages' .pth files when the user provides them (env LPIPS_WEIGHTS /
  DISTS_WEIGHTS);
- without weights, ``make_lpips``/``make_dists`` fall back to randomly-initialized
  backbones — LPIPS(x, x) == 0 and DISTS(x, x) == 0 still hold by construction, and
  the metrics remain usable as *relative* perceptual distances, but absolute values
  will not match the published metrics (documented deviation).
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.checkpoint import load_torch_payload as _load_torch_payload
from flax import linen as nn

from ..nn.torch_layers import TorchConv

# lpips input normalization (lpips/lpips.py ScalingLayer constants)
_LPIPS_SHIFT = jnp.array([-0.030, -0.088, -0.188]).reshape(1, 1, 1, 3)
_LPIPS_SCALE = jnp.array([0.458, 0.448, 0.450]).reshape(1, 1, 1, 3)


def _max_pool(x, window=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), "VALID"
    )


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features with taps after each ReLU (5 taps)."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = TorchConv(64, 11, 4, 2, name="conv0")(x)
        x = nn.relu(x)
        taps.append(x)
        x = _max_pool(x)
        x = TorchConv(192, 5, 1, 2, name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = _max_pool(x)
        x = TorchConv(384, 3, 1, 1, name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = TorchConv(256, 3, 1, 1, name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = TorchConv(256, 3, 1, 1, name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


_LPIPS_CHANNELS = [64, 192, 384, 256, 256]


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True))
    return f / (norm + eps)


class LPIPS(nn.Module):
    """lpips.LPIPS(net='alex') equivalent: unit-normalized feature diffs, learned
    non-negative 1x1 linear heads, spatial mean, sum over taps."""

    def setup(self):
        self.backbone = AlexNetFeatures()
        self.lins = [
            self.param(f"lin{i}", nn.initializers.uniform(0.1), (c,), jnp.float32)
            for i, c in enumerate(_LPIPS_CHANNELS)
        ]

    def __call__(self, x, y):
        """x, y: NHWC in [-1, 1].  Returns (N,) distances."""
        xs = (x - _LPIPS_SHIFT.astype(x.dtype)) / _LPIPS_SCALE.astype(x.dtype)
        ys = (y - _LPIPS_SHIFT.astype(y.dtype)) / _LPIPS_SCALE.astype(y.dtype)
        fx = self.backbone(xs)
        fy = self.backbone(ys)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            w = jnp.abs(self.lins[i]).astype(d.dtype)  # lpips weights are non-negative
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total


class VGG16Stages(nn.Module):
    """VGG16 conv stages with taps at relu1_2, relu2_2, relu3_3, relu4_3, relu5_3."""

    @nn.compact
    def __call__(self, x):
        cfg = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
        taps = []
        ci = 0
        for stage, (n_convs, ch) in enumerate(cfg):
            for _ in range(n_convs):
                x = nn.relu(TorchConv(ch, 3, 1, 1, name=f"conv{ci}")(x))
                ci += 1
            taps.append(x)
            if stage < 4:
                x = _max_pool(x, window=2, stride=2)
        return taps


_DISTS_CHANNELS = [3, 64, 128, 256, 512, 512]


class DISTS(nn.Module):
    """DISTS_pytorch.DISTS equivalent.

    Stages = [input] + 5 VGG16 taps; per-stage per-channel spatial mean/var/cov;
    structure+texture similarities weighted by learned alpha/beta (normalized by
    their joint sum).  Input expected in [-1,1] (converted to [0,1] then
    ImageNet-normalized like the torch package).
    """

    def setup(self):
        self.backbone = VGG16Stages()
        self.alpha = [
            self.param(f"alpha{i}", nn.initializers.constant(0.1), (c,), jnp.float32)
            for i, c in enumerate(_DISTS_CHANNELS)
        ]
        self.beta = [
            self.param(f"beta{i}", nn.initializers.constant(0.1), (c,), jnp.float32)
            for i, c in enumerate(_DISTS_CHANNELS)
        ]

    def _features(self, x):
        x01 = (x + 1.0) / 2.0
        mean = jnp.array([0.485, 0.456, 0.406]).reshape(1, 1, 1, 3).astype(x.dtype)
        std = jnp.array([0.229, 0.224, 0.225]).reshape(1, 1, 1, 3).astype(x.dtype)
        xn = (x01 - mean) / std
        return [xn] + self.backbone(xn)

    def __call__(self, x, y, eps=1e-6):
        fx = self._features(x)
        fy = self._features(y)
        alpha_all = jnp.concatenate([jnp.ravel(a) for a in self.alpha])
        beta_all = jnp.concatenate([jnp.ravel(b) for b in self.beta])
        w_sum = jnp.sum(alpha_all) + jnp.sum(beta_all)

        dist1 = 0.0
        dist2 = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            mu_a = jnp.mean(a, axis=(1, 2))
            mu_b = jnp.mean(b, axis=(1, 2))
            var_a = jnp.var(a, axis=(1, 2))
            var_b = jnp.var(b, axis=(1, 2))
            cov = jnp.mean(a * b, axis=(1, 2)) - mu_a * mu_b
            s1 = (2 * mu_a * mu_b + eps) / (mu_a**2 + mu_b**2 + eps)
            s2 = (2 * cov + eps) / (var_a + var_b + eps)
            wa = (self.alpha[i] / w_sum).astype(s1.dtype)
            wb = (self.beta[i] / w_sum).astype(s2.dtype)
            dist1 = dist1 + jnp.sum(wa * s1, axis=-1)
            dist2 = dist2 + jnp.sum(wb * s2, axis=-1)
        return 1.0 - (dist1 + dist2)


def load_lpips_torch(params_template, path: Optional[str] = None):
    """Fill LPIPS params from the lpips package's alex .pth + torchvision alexnet."""
    path = path or os.environ.get("LPIPS_WEIGHTS")
    if not path or not os.path.isfile(path):
        return None
    import torch

    sd = _load_torch_payload(path)
    tree = jax.tree_util.tree_map(lambda x: x, params_template)  # copy
    p = tree["params"]
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key in sd:
            p[f"lin{i}"] = jnp.asarray(np.asarray(sd[key]).reshape(-1))
    alex_path = os.environ.get("ALEXNET_WEIGHTS")
    if alex_path and os.path.isfile(alex_path):
        asd = _load_torch_payload(alex_path)
        conv_ids = [0, 3, 6, 8, 10]
        for i, ti in enumerate(conv_ids):
            w = np.asarray(asd[f"features.{ti}.weight"])
            b = np.asarray(asd[f"features.{ti}.bias"])
            p["backbone"][f"conv{i}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
    return tree


def load_dists_torch(params_template, path: Optional[str] = None,
                     vgg16_path: Optional[str] = None):
    """Fill DISTS params from the DISTS_pytorch weights.pt (alpha/beta) and a
    torchvision-format vgg16 state_dict for the backbone.

    DISTS_pytorch's checkpoint holds only ``alpha``/``beta`` of shape
    (1, sum(stage_channels), 1, 1); the VGG16 features come from torchvision.
    Returns None if no weights file is available.
    """
    path = path or os.environ.get("DISTS_WEIGHTS")
    if not path or not os.path.isfile(path):
        return None
    import torch

    sd = _load_torch_payload(path)
    tree = jax.tree_util.tree_map(lambda x: x, params_template)  # copy
    p = tree["params"]
    for name in ("alpha", "beta"):
        flat = np.asarray(sd[name]).reshape(-1)
        start = 0
        for i, c in enumerate(_DISTS_CHANNELS):
            p[f"{name}{i}"] = jnp.asarray(flat[start : start + c])
            start += c
    vgg16_path = vgg16_path or os.environ.get("VGG16_WEIGHTS")
    if vgg16_path and os.path.isfile(vgg16_path):
        vsd = _load_torch_payload(vgg16_path)
        if "state_dict" in vsd:
            vsd = vsd["state_dict"]
        conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        for i, ti in enumerate(conv_ids):
            w = np.asarray(vsd[f"features.{ti}.weight"])  # OIHW
            b = np.asarray(vsd[f"features.{ti}.bias"])
            p["backbone"][f"conv{i}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
    return tree


def make_lpips(key=None, weights_path: Optional[str] = None):
    """Returns (apply_fn(x, y) -> (N,), params).  x/y NHWC in [-1,1]."""
    model = LPIPS()
    key = key if key is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3))
    params = model.init(key, dummy, dummy)
    loaded = load_lpips_torch(params, weights_path)
    if loaded is not None:
        params = loaded
    fn = jax.jit(lambda a, b: model.apply(params, a, b))
    return fn, params


def make_dists(key=None, weights_path: Optional[str] = None):
    model = DISTS()
    key = key if key is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3))
    params = model.init(key, dummy, dummy)
    loaded = load_dists_torch(params, weights_path)
    if loaded is not None:
        params = loaded
    fn = jax.jit(lambda a, b: model.apply(params, a, b))
    return fn, params
