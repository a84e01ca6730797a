"""Native DISTS (Deep Image Structure and Texture Similarity).

The reference scores DISTS through pyiqa (`/root/reference/test_metrics.py:127-141`).
This is the metric in JAX (Ding et al. 2020): a VGG16 backbone with L2
pooling instead of max pooling, and per-stage/channel texture (mean) and
structure (covariance) similarities weighted by learned alpha/beta.

Weights-gated like `eval/{fid,lpips}.py`: needs a converted checkpoint
(`dists.npz` from `convert_dists`) or the harness reports UNAVAILABLE.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
STAGE_CHANNELS = (3, 64, 128, 256, 512, 512)


def _hann2d(size: int = 3) -> np.ndarray:
    a = np.hanning(size + 2)[1:-1]
    w = np.outer(a, a)
    return (w / w.sum()).astype(np.float32)


def l2_pool(x: jax.Array, size: int = 3, stride: int = 2) -> jax.Array:
    """sqrt(hann-weighted average of squares), the DISTS downsampler."""
    c = x.shape[-1]
    k = jnp.asarray(_hann2d(size)).reshape(size, size, 1, 1)
    k = jnp.tile(k, (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(
        jnp.square(x), k, window_strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return jnp.sqrt(jnp.maximum(y, 1e-12))


class VGG16L2Pool(nn.Module):
    """VGG16 feature taps with L2 pooling between stages; tap 0 is the
    (ImageNet-normalised) input itself."""

    @nn.compact
    def __call__(self, x):
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        taps = [x]
        idx = 0
        for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
            if stage > 0:
                x = l2_pool(x)
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)
        return taps


class DISTS(nn.Module):
    @nn.compact
    def __call__(self, a, b):
        """a, b: [B, H, W, 3] in [0, 1]. Returns [B] distances (lower =
        more similar)."""
        backbone = VGG16L2Pool(name="backbone")
        fa = backbone(a)
        fb = backbone(b)
        c1 = c2 = 1e-6
        total_dist = 0.0
        alpha = [self.param(f"alpha{i}", nn.initializers.ones, (c,),
                            jnp.float32)
                 for i, c in enumerate(STAGE_CHANNELS)]
        beta = [self.param(f"beta{i}", nn.initializers.ones, (c,),
                           jnp.float32)
                for i, c in enumerate(STAGE_CHANNELS)]
        w_sum = sum(jnp.sum(a_) for a_ in alpha) + sum(
            jnp.sum(b_) for b_ in beta)
        score = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            mu_a = jnp.mean(xa, axis=(1, 2))            # [B, C]
            mu_b = jnp.mean(xb, axis=(1, 2))
            var_a = jnp.mean(jnp.square(xa), axis=(1, 2)) - jnp.square(mu_a)
            var_b = jnp.mean(jnp.square(xb), axis=(1, 2)) - jnp.square(mu_b)
            cov = jnp.mean(xa * xb, axis=(1, 2)) - mu_a * mu_b
            texture = (2 * mu_a * mu_b + c1) / (
                jnp.square(mu_a) + jnp.square(mu_b) + c1)
            structure = (2 * cov + c2) / (var_a + var_b + c2)
            score = score + jnp.sum(
                alpha[i][None] * texture + beta[i][None] * structure,
                axis=-1)
        return 1.0 - score / w_sum


def convert_dists(state_dict: Dict) -> Dict:
    """DISTS torch checkpoint -> params. Keys: `stage1.0.weight`-style VGG
    convs (or `features.N.weight`), plus `alpha`/`beta` [1, sum(C), 1, 1]."""
    convs = {}
    conv_keys = [k for k in state_dict
                 if k.endswith(".weight")
                 and np.asarray(state_dict[k]).ndim == 4]

    def order(k):
        parts = k.split(".")
        nums = [int(p) for p in parts if p.isdigit()]
        stage = (int(parts[0].replace("stage", ""))
                 if parts[0].startswith("stage") else 0)
        return (stage, nums)

    for i, k in enumerate(sorted(conv_keys, key=order)):
        w = np.asarray(state_dict[k], np.float32)
        b = np.asarray(state_dict[k[:-len("weight")] + "bias"], np.float32)
        convs[f"conv{i}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    assert len(convs) == 13, f"expected 13 VGG convs, got {len(convs)}"
    params: Dict = {"backbone": convs}
    alpha = np.asarray(state_dict["alpha"], np.float32).reshape(-1)
    beta = np.asarray(state_dict["beta"], np.float32).reshape(-1)
    off = 0
    for i, c in enumerate(STAGE_CHANNELS):
        params[f"alpha{i}"] = alpha[off:off + c]
        params[f"beta{i}"] = beta[off:off + c]
        off += c
    assert off == alpha.size == beta.size
    return params


_DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "dists.npz")


def make_dists(weights_path: Optional[str] = None):
    """DISTS callable `(img, ref in [0,1]) -> float`, or None when no
    weights exist."""
    from .lpips import load_lpips_params

    path = weights_path or _DEFAULT_WEIGHTS
    if not os.path.exists(path):
        return None
    params = {"params": load_lpips_params(path)}
    model = DISTS()
    apply = jax.jit(model.apply)

    def call(img: np.ndarray, ref: np.ndarray) -> float:
        if img.ndim == 3:
            img, ref = img[None], ref[None]
        return float(apply(params, jnp.asarray(img, jnp.float32),
                           jnp.asarray(ref, jnp.float32))[0])

    return call
