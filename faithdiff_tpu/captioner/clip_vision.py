"""CLIP vision tower (ViT-L/14-336) for the captioning branch.

Capability-equivalent to the reference `CLIPVisionTower`
(`/root/reference/llava/model/multimodal_encoder/clip_encoder.py:7-88`):
select hidden layer `mm_vision_select_layer` (-2 for LLaVA) and drop the
CLS token ("patch" select feature). NHWC patches, fp32 norms.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import ACT2FN, LayerNorm
from ..ops.attention import multi_head_attention

Dtype = Any

# CLIP image normalisation (OPENAI_CLIP_MEAN/STD)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def tiny_vision_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(image_size=56, patch_size=14, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=4)


class _VisionLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d, heads = cfg.hidden_size, cfg.num_attention_heads

        h = LayerNorm(cfg.layer_norm_eps, name="layer_norm1")(x)
        dense = lambda name: nn.Dense(  # noqa: E731
            d, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q, k, v = (dense(n)(h) for n in ("q_proj", "k_proj", "v_proj"))
        b, s, _ = h.shape
        hd = d // heads

        def split(t):
            return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

        attn = multi_head_attention(split(q), split(k), split(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + dense("out_proj")(attn)

        h = LayerNorm(cfg.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = ACT2FN[cfg.hidden_act](h)
        h = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """Returns patch features from the selected hidden layer (default -2),
    CLS dropped — shape [B, num_patches, hidden]."""

    config: CLIPVisionConfig = CLIPVisionConfig()
    select_layer: int = -2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: [B, H, W, 3], already CLIP-normalised."""
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(
            cls.astype(self.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.num_patches + 1, cfg.hidden_size), jnp.float32)
        x = x + pos[None].astype(self.dtype)
        x = LayerNorm(cfg.layer_norm_eps, name="pre_layrnorm")(x)

        n_run = cfg.num_hidden_layers + self.select_layer + 1
        selected = x
        for i in range(cfg.num_hidden_layers):
            if i == n_run:
                selected = x  # hidden_states[select_layer]
            x = _VisionLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        if n_run == cfg.num_hidden_layers:
            selected = x
        return selected[:, 1:, :]  # drop CLS ("patch" feature select)


class VisionProjector(nn.Module):
    """mlp2x_gelu projector (`llava/model/multimodal_projector/builder.py`)."""

    out_dim: int = 5120
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear_0")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="linear_2")(x)


def preprocess_clip_image(img: np.ndarray, image_size: int = 336,
                          pad_square: bool = True) -> np.ndarray:
    """HWC uint8 -> [1, S, S, 3] CLIP-normalised.

    Mirrors `expand2square` + CLIPImageProcessor: pad to square with the
    mean color, resize bicubic, normalise (`llava/mm_utils.py:119-183`)."""
    from PIL import Image

    h, w = img.shape[:2]
    if pad_square and h != w:
        side = max(h, w)
        bg = np.tile((CLIP_MEAN * 255).astype(np.uint8), (side, side, 1))
        y0, x0 = (side - h) // 2, (side - w) // 2
        bg[y0:y0 + h, x0:x0 + w] = img
        img = bg
    img = np.asarray(
        Image.fromarray(img).resize((image_size, image_size), Image.BICUBIC))
    x = img.astype(np.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    return x[None]


# ---------------------------------------------------------------------------
# anyres (variable-resolution) preprocessing
# (`/root/reference/llava/mm_utils.py:12-145`; used by LLaVA-1.6-style
# checkpoints — LLaVA-1.5, the FaithDiff captioner, uses the square path)
# ---------------------------------------------------------------------------

def select_best_resolution(original_size, possible_resolutions):
    """Pick the grid resolution maximising effective (non-wasted) pixels
    (`mm_utils.py:12-40`). Sizes are (width, height)."""
    ow, oh = original_size
    best, best_eff, min_waste = None, 0, float("inf")
    for w, h in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < min_waste):
            best_eff, min_waste, best = eff, waste, (w, h)
    return best


def resize_and_pad_image(img: np.ndarray, target_resolution) -> np.ndarray:
    """Aspect-preserving resize then center-pad with black to
    (width, height) (`mm_utils.py:42-75`)."""
    import math

    from PIL import Image

    oh, ow = img.shape[:2]
    tw, th = target_resolution
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw, nh = tw, min(math.ceil(oh * scale_w), th)
    else:
        nh, nw = th, min(math.ceil(ow * scale_h), tw)
    resized = np.asarray(Image.fromarray(img).resize((nw, nh)))
    out = np.zeros((th, tw, 3), img.dtype)
    y0, x0 = (th - nh) // 2, (tw - nw) // 2
    out[y0:y0 + nh, x0:x0 + nw] = resized
    return out


def divide_to_patches(img: np.ndarray, patch_size: int):
    """Row-major square crops (`mm_utils.py:77-96`)."""
    patches = []
    h, w = img.shape[:2]
    for i in range(0, h, patch_size):
        for j in range(0, w, patch_size):
            patches.append(img[i:i + patch_size, j:j + patch_size])
    return patches


def process_anyres_image(img: np.ndarray, image_size: int,
                         grid_pinpoints) -> np.ndarray:
    """Image -> [1 + n_patches, S, S, 3] CLIP-normalised stack: the resized
    base image first, then the best-grid patches
    (`mm_utils.py:119-145`)."""
    import ast

    if isinstance(grid_pinpoints, str):
        grid_pinpoints = ast.literal_eval(grid_pinpoints)
    best = select_best_resolution((img.shape[1], img.shape[0]),
                                  grid_pinpoints)
    padded = resize_and_pad_image(img, best)
    patches = divide_to_patches(padded, image_size)
    from PIL import Image

    base = np.asarray(Image.fromarray(img).resize((image_size, image_size)))
    stack = [base] + patches
    return np.concatenate([
        preprocess_clip_image(p, image_size, pad_square=False)
        for p in stack])
