"""Native LPIPS (Learned Perceptual Image Patch Similarity).

The reference scores LPIPS through pyiqa (CUDA torch,
`/root/reference/test_metrics.py:127-141`). This is the metric network in
JAX: a frozen AlexNet or VGG16 feature backbone, per-layer unit
normalisation, squared feature differences weighted by learned 1x1 linear
heads, spatially averaged and summed over stages (Zhang et al. 2018).

Weights-gated like `eval/fid.py`: without a converted checkpoint
(`lpips_<net>.npz`, built by `convert_lpips` from the torchvision backbone
+ LPIPS linear-head state dicts) the harness reports
`UNAVAILABLE: no LPIPS weights` instead of a silently-missing metric.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# input scaling (the lpips package's ScalingLayer constants)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

# conv definitions per backbone: (out_ch, kernel, stride, maxpool_before)
_ALEX = [(64, 11, 4, False), (192, 5, 1, True), (384, 3, 1, True),
         (256, 3, 1, False), (256, 3, 1, False)]
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


class AlexFeatures(nn.Module):
    """AlexNet.features truncated at each ReLU stage (5 taps)."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (ch, k, s, pool_before) in enumerate(_ALEX):
            if pool_before:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            pad = (k - 1) // 2 if k != 11 else 2
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=pad,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """VGG16 features with taps at relu{1_2,2_2,3_3,4_3,5_3}."""

    @nn.compact
    def __call__(self, x):
        taps = []
        idx = 0
        for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)
            if stage != len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Full LPIPS net: backbone taps -> unit-norm -> lin heads -> mean."""

    net: str = "alex"

    @nn.compact
    def __call__(self, a, b):
        """a, b: [B, H, W, 3] in [-1, 1]. Returns [B] distances."""
        backbone = (AlexFeatures(name="backbone") if self.net == "alex"
                    else VGG16Features(name="backbone"))

        def scale(x):
            return (x - _SHIFT) / _SCALE

        fa = backbone(scale(a))
        fb = backbone(scale(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(
                jnp.sum(jnp.square(xa), axis=-1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(
                jnp.sum(jnp.square(xb), axis=-1, keepdims=True) + 1e-10)
            diff = jnp.square(na - nb)
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (diff.shape[-1],), jnp.float32)
            # 1x1 conv head == per-channel weight then channel sum
            d = jnp.sum(diff * jnp.maximum(w, 0.0), axis=-1)
            total = total + jnp.mean(d, axis=(1, 2))
        return total


def convert_lpips(backbone_sd: Dict, lin_sd: Dict,
                  net: str = "alex") -> Dict:
    """(torchvision backbone state dict, lpips lin state dict) -> params.

    backbone keys: `features.N.weight/bias` (torchvision AlexNet/VGG16);
    lin keys: `lin{i}.model.1.weight` ([1, C, 1, 1])."""
    convs = {}
    conv_idx = 0
    n_convs = 5 if net == "alex" else 13
    for key in sorted(backbone_sd,
                      key=lambda k: int(k.split(".")[1])):
        if not key.endswith(".weight") or backbone_sd[key].ndim != 4:
            continue
        w = np.asarray(backbone_sd[key], np.float32)
        bkey = key[:-len("weight")] + "bias"
        convs[f"conv{conv_idx}"] = {
            "kernel": w.transpose(2, 3, 1, 0),  # OIHW -> HWIO
            "bias": np.asarray(backbone_sd[bkey], np.float32),
        }
        conv_idx += 1
    assert conv_idx == n_convs, f"expected {n_convs} convs, got {conv_idx}"
    params = {"backbone": convs}
    for i in range(5):
        w = np.asarray(lin_sd[f"lin{i}.model.1.weight"], np.float32)
        params[f"lin{i}"] = w.reshape(-1)
    return params


_DEFAULT_WEIGHTS = {
    "alex": os.path.join(os.path.dirname(__file__), "lpips_alex.npz"),
    "vgg": os.path.join(os.path.dirname(__file__), "lpips_vgg.npz"),
}


def load_lpips_params(path: str) -> Dict:
    flat = np.load(path)
    params: Dict = {}
    for key, value in flat.items():
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return params


def save_lpips_params(params: Dict, path: str) -> None:
    flat = {}

    def walk(node, prefix=""):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params)
    np.savez(path, **flat)


def make_lpips(weights_path: Optional[str] = None, net: str = "alex"):
    """LPIPS callable `(img, ref in [0,1] HWC/NHWC) -> float`, or None when
    no weights exist (harness reports UNAVAILABLE)."""
    path = weights_path or _DEFAULT_WEIGHTS[net]
    if not os.path.exists(path):
        return None
    params = {"params": load_lpips_params(path)}
    model = LPIPS(net=net)
    apply = jax.jit(model.apply)

    def call(img: np.ndarray, ref: np.ndarray) -> float:
        if img.ndim == 3:
            img, ref = img[None], ref[None]
        a = jnp.asarray(img, jnp.float32) * 2.0 - 1.0
        b = jnp.asarray(ref, jnp.float32) * 2.0 - 1.0
        return float(apply(params, a, b)[0])

    return call
