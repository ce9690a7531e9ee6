"""Synthetic-weights fixture tests for the perceptual-metric torch loaders.

No pretrained VGG/AlexNet/LPIPS/DISTS weights exist in this environment (no egress),
so these tests build tiny random state_dicts in the ORIGINAL packages' layouts
(torchvision vgg19/vgg16/alexnet ``features.{i}.weight``; lpips ``lin{i}.model.1.weight``;
DISTS ``alpha``/``beta``), load them through our loaders, and compare one forward
against independent torch.nn.functional oracles — proving the layout mapping so that
user-provided real weights work first try.  (Reference consumers: paper_gan.py:203-216,
evaluate_Unet_diffusion/evaluate_model.py:79-80.)
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu import enable_strict_precision
from vub_image_denoising_tpu.eval.perceptual import (
    _DISTS_CHANNELS,
    _LPIPS_CHANNELS,
    DISTS,
    LPIPS,
    load_dists_torch,
    load_lpips_torch,
)
from vub_image_denoising_tpu.models.vgg import VGG19Features, load_torch_vgg19


def _conv_sd(rng, entries):
    """{features.i: (cin, cout, k)} -> torchvision-style state_dict tensors."""
    sd = {}
    for i, (cin, cout, k) in entries.items():
        sd[f"features.{i}.weight"] = torch.tensor(
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        )
        sd[f"features.{i}.bias"] = torch.tensor(rng.randn(cout).astype(np.float32) * 0.05)
    return sd


def test_vgg19_loader_matches_torch(tmp_path):
    enable_strict_precision()
    rng = np.random.RandomState(0)
    # vgg19 features[:8]: convs at torchvision indices 0, 2, 5, 7
    sd = _conv_sd(rng, {0: (3, 64, 3), 2: (64, 64, 3), 5: (64, 128, 3), 7: (128, 128, 3)})
    path = tmp_path / "vgg19.pth"
    torch.save(sd, path)

    model = VGG19Features(num_layers=8)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = load_torch_vgg19(template, str(path))
    assert params is not None

    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    y = np.asarray(model.apply(params, jnp.asarray(x)))

    with torch.no_grad():
        t = torch.tensor(x).permute(0, 3, 1, 2)
        t = F.relu(F.conv2d(t, sd["features.0.weight"], sd["features.0.bias"], padding=1))
        t = F.relu(F.conv2d(t, sd["features.2.weight"], sd["features.2.bias"], padding=1))
        t = F.max_pool2d(t, 2, 2)
        t = F.relu(F.conv2d(t, sd["features.5.weight"], sd["features.5.bias"], padding=1))
        t = F.conv2d(t, sd["features.7.weight"], sd["features.7.bias"], padding=1)
        y_ref = t.permute(0, 2, 3, 1).numpy()  # features[:8] ends pre-ReLU
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def _alexnet_oracle_taps(x, sd):
    """torchvision AlexNet.features taps after each ReLU (5 taps)."""
    taps = []
    t = F.relu(F.conv2d(x, sd["features.0.weight"], sd["features.0.bias"],
                        stride=4, padding=2))
    taps.append(t)
    t = F.max_pool2d(t, 3, 2)
    t = F.relu(F.conv2d(t, sd["features.3.weight"], sd["features.3.bias"], padding=2))
    taps.append(t)
    t = F.max_pool2d(t, 3, 2)
    for i in (6, 8, 10):
        t = F.relu(F.conv2d(t, sd[f"features.{i}.weight"], sd[f"features.{i}.bias"],
                            padding=1))
        taps.append(t)
    return taps


def test_lpips_loader_matches_torch(tmp_path, monkeypatch):
    enable_strict_precision()
    rng = np.random.RandomState(1)
    alex_sd = _conv_sd(rng, {0: (3, 64, 11), 3: (64, 192, 5), 6: (192, 384, 3),
                             8: (384, 256, 3), 10: (256, 256, 3)})
    lin_sd = {
        f"lin{i}.model.1.weight": torch.tensor(
            rng.rand(1, c, 1, 1).astype(np.float32)  # lpips weights are non-negative
        )
        for i, c in enumerate(_LPIPS_CHANNELS)
    }
    alex_path, lin_path = tmp_path / "alex.pth", tmp_path / "lpips_alex.pth"
    torch.save(alex_sd, alex_path)
    torch.save(lin_sd, lin_path)
    monkeypatch.setenv("ALEXNET_WEIGHTS", str(alex_path))

    model = LPIPS()
    dummy = jnp.zeros((1, 64, 64, 3))
    template = model.init(jax.random.PRNGKey(0), dummy, dummy)
    params = load_lpips_torch(template, str(lin_path))
    assert params is not None

    x = (rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = (rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    d = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(y)))

    with torch.no_grad():
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        xt = (torch.tensor(x).permute(0, 3, 1, 2) - shift) / scale
        yt = (torch.tensor(y).permute(0, 3, 1, 2) - shift) / scale
        fx = _alexnet_oracle_taps(xt, alex_sd)
        fy = _alexnet_oracle_taps(yt, alex_sd)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            an = a / (a.norm(dim=1, keepdim=True) + 1e-10)
            bn = b / (b.norm(dim=1, keepdim=True) + 1e-10)
            diff = (an - bn) ** 2
            w = lin_sd[f"lin{i}.model.1.weight"]
            total = total + F.conv2d(diff, w).mean(dim=(2, 3)).squeeze(1)
        d_ref = total.numpy()
    np.testing.assert_allclose(d, d_ref, rtol=1e-3, atol=1e-4)


def _vgg16_oracle_taps(x, sd):
    """VGG16 stage taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3."""
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    per_stage = [2, 2, 3, 3, 3]
    taps, ci = [], 0
    t = x
    for stage, n in enumerate(per_stage):
        for _ in range(n):
            i = conv_ids[ci]
            t = F.relu(F.conv2d(t, sd[f"features.{i}.weight"],
                                sd[f"features.{i}.bias"], padding=1))
            ci += 1
        taps.append(t)
        if stage < 4:
            t = F.max_pool2d(t, 2, 2)
    return taps


def test_dists_loader_matches_torch(tmp_path, monkeypatch):
    enable_strict_precision()
    rng = np.random.RandomState(2)
    cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
           (256, 256), (256, 512), (512, 512), (512, 512), (512, 512), (512, 512),
           (512, 512)]
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg_sd = _conv_sd(rng, {i: (cin, cout, 3) for i, (cin, cout) in zip(conv_ids, cfg)})
    total_c = sum(_DISTS_CHANNELS)
    dists_sd = {
        "alpha": torch.tensor(rng.rand(1, total_c, 1, 1).astype(np.float32)),
        "beta": torch.tensor(rng.rand(1, total_c, 1, 1).astype(np.float32)),
    }
    vgg_path, dists_path = tmp_path / "vgg16.pth", tmp_path / "dists.pt"
    torch.save(vgg_sd, vgg_path)
    torch.save(dists_sd, dists_path)
    monkeypatch.setenv("VGG16_WEIGHTS", str(vgg_path))

    model = DISTS()
    dummy = jnp.zeros((1, 64, 64, 3))
    template = model.init(jax.random.PRNGKey(0), dummy, dummy)
    params = load_dists_torch(template, str(dists_path))
    assert params is not None

    x = (rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = (rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    d = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(y)))

    with torch.no_grad():
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

        def feats(v):
            v01 = (torch.tensor(v).permute(0, 3, 1, 2) + 1.0) / 2.0
            vn = (v01 - mean) / std
            return [vn] + _vgg16_oracle_taps(vn, vgg_sd)

        fx, fy = feats(x), feats(y)
        alpha = dists_sd["alpha"].view(-1)
        beta = dists_sd["beta"].view(-1)
        w_sum = alpha.sum() + beta.sum()
        eps = 1e-6
        dist1 = torch.zeros(2)
        dist2 = torch.zeros(2)
        start = 0
        for i, (a, b) in enumerate(zip(fx, fy)):
            c = _DISTS_CHANNELS[i]
            mu_a, mu_b = a.mean(dim=(2, 3)), b.mean(dim=(2, 3))
            var_a = a.var(dim=(2, 3), unbiased=False)
            var_b = b.var(dim=(2, 3), unbiased=False)
            cov = (a * b).mean(dim=(2, 3)) - mu_a * mu_b
            s1 = (2 * mu_a * mu_b + eps) / (mu_a**2 + mu_b**2 + eps)
            s2 = (2 * cov + eps) / (var_a + var_b + eps)
            wa = alpha[start : start + c] / w_sum
            wb = beta[start : start + c] / w_sum
            dist1 = dist1 + (wa * s1).sum(dim=1)
            dist2 = dist2 + (wb * s2).sum(dim=1)
            start += c
        d_ref = (1.0 - (dist1 + dist2)).numpy()
    np.testing.assert_allclose(d, d_ref, rtol=1e-3, atol=1e-4)
