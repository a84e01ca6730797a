"""Native PaQ-2-PiQ (Ying et al. 2020, "From Patches to Pictures").

The reference scores `paq2piq` through pyiqa
(`/root/reference/test_metrics.py:127-141`). This is the published
RoIPoolModel in JAX: a ResNet-18 trunk (ImageNet-normalised input,
BatchNorm running statistics folded in at inference) followed by the
fastai-style head — concat of global max- and average-pooled features,
BatchNorm1d, Linear(1024, 512), ReLU, BatchNorm1d, Linear(512, 1).

The picture-level score is the head over the whole feature map; patch
scores (the RoI branch of the paper) come from `roi_scores`, which pools
the same trunk features over an arbitrary box grid — pure slicing, no
CUDA RoIPool op needed.

Weights-gated like `eval/{lpips,dists,clipiqa,musiq}.py`. `convert_paq2piq`
maps the torch RoIPoolModel layout (`body.*` torchvision ResNet-18
children, `head.*` sequential indices), the naming the original
repository and pyiqa both use.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

# ResNet-18: 4 stages x 2 BasicBlocks; first block of stages 2-4 strides 2
_STAGES = ((64, 1), (128, 2), (256, 2), (512, 2))


class _BN(nn.Module):
    """Inference BatchNorm: y = (x - mean) / sqrt(var + eps) * scale + bias
    with running statistics stored as parameters."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = _BN(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = _BN(self.features, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=False, name="down_conv")(x)
            x = _BN(self.features, name="down_bn")(x)
        return nn.relu(x + y)


class ResNet18Trunk(nn.Module):
    """torchvision ResNet-18 cut before the classifier (children[:-2])."""

    @nn.compact
    def __call__(self, x):
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_BN(64, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for s, (ch, stride) in enumerate(_STAGES):
            for b in range(2):
                x = _BasicBlock(ch, stride if b == 0 else 1,
                                name=f"layer{s + 1}_{b}")(x)
        return x                                            # [B, H/32, W/32, 512]


class PaQ2PiQHead(nn.Module):
    """fastai head: [max-pool ++ avg-pool] -> BN -> FC(512) -> ReLU -> BN
    -> FC(1). Dropout is inference-off."""

    @nn.compact
    def __call__(self, feats):
        mx = jnp.max(feats, axis=(1, 2))
        av = jnp.mean(feats, axis=(1, 2))
        x = jnp.concatenate([mx, av], axis=-1)              # [B, 1024]
        x = _BN(1024, name="bn0")(x)
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        x = _BN(512, name="bn1")(x)
        return nn.Dense(1, name="fc2")(x)[:, 0]


class PaQ2PiQ(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] in [0, 1]. Returns [B] picture-level quality
        (the published model outputs roughly a 0-100 MOS scale)."""
        feats = ResNet18Trunk(name="body")(x)
        return PaQ2PiQHead(name="head")(feats)


def roi_scores(params: Dict, image: np.ndarray,
               grid: Tuple[int, int] = (4, 4)) -> np.ndarray:
    """Patch-level qualities: trunk features pooled per grid cell through
    the same head (the paper's RoIPool branch on an aligned grid)."""
    model_body = ResNet18Trunk()
    head = PaQ2PiQHead()
    feats = model_body.apply({"params": params["body"]},
                             jnp.asarray(image, jnp.float32)[None])
    _, fh, fw, _ = feats.shape
    gh, gw = grid
    rows = np.linspace(0, fh, gh + 1).astype(int)
    cols = np.linspace(0, fw, gw + 1).astype(int)
    out = np.zeros(grid, np.float32)
    for i in range(gh):
        for j in range(gw):
            cell = feats[:, rows[i]:max(rows[i] + 1, rows[i + 1]),
                         cols[j]:max(cols[j] + 1, cols[j + 1])]
            out[i, j] = float(head.apply({"params": params["head"]}, cell)[0])
    return out


def convert_paq2piq(state_dict: Dict) -> Dict:
    """torch RoIPoolModel -> params. `body.{0,1}` = stem conv/bn,
    `body.{4..7}.{0,1}` = stages, `.downsample.{0,1}` = shortcut;
    `head.{1,3,5,7}` = BN1d / Linear / BN1d / Linear (fastai indices with
    flatten+dropout interleaved)."""
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"],
                "var": sd[f"{prefix}.running_var"]}

    def conv(key):
        return {"kernel": sd[key].transpose(2, 3, 1, 0)}

    body: Dict = {"conv1": conv("body.0.weight"), "bn1": bn("body.1")}
    for s in range(4):
        for b in range(2):
            p = f"body.{4 + s}.{b}"
            blk = {"conv1": conv(f"{p}.conv1.weight"), "bn1": bn(f"{p}.bn1"),
                   "conv2": conv(f"{p}.conv2.weight"), "bn2": bn(f"{p}.bn2")}
            if f"{p}.downsample.0.weight" in sd:
                blk["down_conv"] = conv(f"{p}.downsample.0.weight")
                blk["down_bn"] = bn(f"{p}.downsample.1")
            body[f"layer{s + 1}_{b}"] = blk

    # fastai head indices: 0 concat-pool, 1 BN1d, 2 dropout, 3 linear,
    # 4 relu, 5 BN1d, 6 dropout, 7 linear (a flatten shifts some exports
    # by one — detect by tensor shapes instead of hardcoding)
    lin_keys = sorted(
        {int(k.split(".")[1]) for k in sd
         if k.startswith("head.") and k.endswith(".weight")
         and sd[k].ndim == 2})
    bn_keys = sorted(
        {int(k.split(".")[1]) for k in sd
         if k.startswith("head.") and f"head.{k.split('.')[1]}.running_mean"
         in sd})
    assert len(lin_keys) == 2 and len(bn_keys) == 2, (lin_keys, bn_keys)
    head = {
        "bn0": bn(f"head.{bn_keys[0]}"),
        "fc1": {"kernel": sd[f"head.{lin_keys[0]}.weight"].T,
                "bias": sd[f"head.{lin_keys[0]}.bias"]},
        "bn1": bn(f"head.{bn_keys[1]}"),
        "fc2": {"kernel": sd[f"head.{lin_keys[1]}.weight"].T,
                "bias": sd[f"head.{lin_keys[1]}.bias"]},
    }
    return {"body": body, "head": head}


_DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "paq2piq.npz")


def make_paq2piq(weights_path: Optional[str] = None):
    """PaQ-2-PiQ callable `(img [H, W, 3] in [0,1]) -> float`, or None
    when no converted weights exist (harness reports UNAVAILABLE)."""
    from .lpips import load_lpips_params

    path = weights_path or _DEFAULT_WEIGHTS
    if not os.path.exists(path):
        return None
    params = {"params": load_lpips_params(path)}
    apply = jax.jit(PaQ2PiQ().apply)

    def call(img: np.ndarray) -> float:
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        return float(apply(params, jnp.asarray(img, jnp.float32)[None])[0])

    return call
