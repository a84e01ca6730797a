"""Native CLIPIQA (CLIP-based no-reference image quality).

The reference scores `clipiqa+_vitL14_512` through pyiqa
(`/root/reference/test_metrics.py:127-141`). CLIPIQA (Wang et al. 2023)
scores an image by the softmax over CLIP similarities against an
antonym prompt pair:

    score = softmax([cos(img, "Good photo."), cos(img, "Bad photo.")]
                    * logit_scale)[good]

This module implements the full CLIP dual tower in JAX (ViT vision trunk
with pooled+projected embedding, text tower reused from
`models/clip_text.CLIPTextTower`), a converter from the transformers
`CLIPModel` state-dict naming, and position-embedding interpolation so the
512-input variant of the reference metric runs on 224/336 checkpoints.

CLIPIQA+ learned prompts are supported by passing prompt *embeddings*
(`prompt_embeds`) instead of tokenized text. Weights-gated like
`eval/{fid,lpips,dists}.py`.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..captioner.clip_vision import CLIPVisionConfig, _VisionLayer
from ..config import CLIPTextConfig
from ..models.clip_text import CLIPTextTower
from ..models.layers import LayerNorm


class CLIPImageEncoder(nn.Module):
    """ViT trunk -> post-LayerNorm CLS -> visual projection [B, proj]."""

    config: CLIPVisionConfig
    projection_dim: int = 768

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        cfg = self.config
        b, h, w, _ = pixel_values.shape
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, param_dtype=jnp.float32,
            name="patch_embedding")(pixel_values)
        gh, gw = patches.shape[1], patches.shape[2]
        patches = patches.reshape(b, gh * gw, cfg.hidden_size)

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), patches], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.num_patches + 1, cfg.hidden_size), jnp.float32)
        side = int(np.sqrt(cfg.num_patches))
        if gh != side or gw != side:
            # bilinear-interpolate the patch-grid position embeddings to the
            # input resolution (how pyiqa runs ViT-L/14 at 512)
            grid = pos[1:].reshape(side, side, cfg.hidden_size)
            grid = jax.image.resize(grid, (gh, gw, cfg.hidden_size),
                                    method="bilinear")
            pos = jnp.concatenate(
                [pos[:1], grid.reshape(gh * gw, cfg.hidden_size)], axis=0)
        x = x + pos[None]
        x = LayerNorm(cfg.layer_norm_eps, name="pre_layrnorm")(x)
        for i in range(cfg.num_hidden_layers):
            x = _VisionLayer(cfg, name=f"layers_{i}")(x)
        pooled = LayerNorm(cfg.layer_norm_eps, name="post_layernorm")(
            x[:, 0])
        return nn.Dense(self.projection_dim, use_bias=False,
                        param_dtype=jnp.float32,
                        name="visual_projection")(pooled)


class CLIPIQA(nn.Module):
    vision_config: CLIPVisionConfig
    text_config: CLIPTextConfig
    eos_token_id: int = 49407

    @nn.compact
    def __call__(self, pixel_values, prompt_ids=None, prompt_embeds=None):
        """pixel_values: [B, H, W, 3] CLIP-normalised; prompt_ids:
        [2, 77] (good, bad) token ids — or precomputed [2, proj]
        `prompt_embeds` (the CLIPIQA+ learned-prompt path). Returns [B]
        quality in (0, 1)."""
        proj = self.text_config.projection_dim
        img = CLIPImageEncoder(self.vision_config, projection_dim=proj,
                               name="vision")(pixel_values)
        if prompt_embeds is None:
            _, _, prompt_embeds = CLIPTextTower(
                self.text_config, name="text")(
                    prompt_ids, eos_token_id=self.eos_token_id)
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(np.log(100.0)), ())
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = prompt_embeds / jnp.linalg.norm(prompt_embeds, axis=-1,
                                              keepdims=True)
        logits = jnp.exp(logit_scale) * img @ txt.T          # [B, 2]
        return jax.nn.softmax(logits, axis=-1)[:, 0]


def clip_vit_l14_configs() -> Tuple[CLIPVisionConfig, CLIPTextConfig]:
    vision = CLIPVisionConfig(image_size=224, patch_size=14,
                              hidden_size=1024, intermediate_size=4096,
                              num_hidden_layers=24, num_attention_heads=16)
    text = CLIPTextConfig.sdxl_text_encoder()  # ViT-L/14 text tower
    import dataclasses

    text = dataclasses.replace(text, projection_dim=768)
    return vision, text


def convert_clip_model(state_dict: Dict) -> Dict:
    """transformers `CLIPModel` state dict -> CLIPIQA params."""
    vision: Dict = {}
    text: Dict = {}
    out: Dict = {"vision": vision, "text": text}

    def put(tree, parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, v in state_dict.items():
        arr = np.asarray(v, np.float32)
        parts = key.split(".")
        if key == "logit_scale":
            out["logit_scale"] = arr
        elif key == "visual_projection.weight":
            put(vision, ("visual_projection", "kernel"), arr.T)
        elif key == "text_projection.weight":
            put(text, ("text_projection", "kernel"), arr.T)
        elif parts[0] == "vision_model":
            sub = parts[1:]
            if sub[0] == "embeddings":
                if sub[1] == "patch_embedding":
                    put(vision, ("patch_embedding", "kernel"),
                        arr.transpose(2, 3, 1, 0))
                elif sub[1] == "class_embedding":
                    vision["class_embedding"] = arr.reshape(-1)
                elif sub[1] == "position_embedding":
                    vision["position_embedding"] = arr
            elif sub[0] in ("pre_layrnorm", "post_layernorm"):
                put(vision, (sub[0], "scale" if sub[1] == "weight"
                             else "bias"), arr)
            elif sub[0] == "encoder":
                i = sub[2]
                rest = sub[3:]
                name = rest[0]
                if name in ("layer_norm1", "layer_norm2"):
                    put(vision, (f"layers_{i}", name,
                                 "scale" if rest[1] == "weight" else "bias"),
                        arr)
                elif name == "self_attn":
                    put(vision, (f"layers_{i}", rest[1],
                                 "kernel" if rest[2] == "weight" else "bias"),
                        arr.T if rest[2] == "weight" else arr)
                elif name == "mlp":
                    put(vision, (f"layers_{i}", rest[1],
                                 "kernel" if rest[2] == "weight" else "bias"),
                        arr.T if rest[2] == "weight" else arr)
        elif parts[0] == "text_model":
            sub = parts[1:]
            if sub[0] == "embeddings":
                if sub[1] == "token_embedding":
                    put(text, ("token_embedding", "embedding"), arr)
                elif sub[1] == "position_embedding":
                    text["position_embedding"] = arr
            elif sub[0] == "final_layer_norm":
                put(text, ("final_layer_norm",
                           "scale" if sub[1] == "weight" else "bias"), arr)
            elif sub[0] == "encoder":
                i = sub[2]
                rest = sub[3:]
                name = rest[0]
                if name in ("layer_norm1", "layer_norm2"):
                    put(text, (f"layers_{i}", name,
                               "scale" if rest[1] == "weight" else "bias"),
                        arr)
                elif name in ("self_attn", "mlp"):
                    put(text, (f"layers_{i}", name, rest[1],
                               "kernel" if rest[2] == "weight" else "bias"),
                        arr.T if rest[2] == "weight" else arr)
    return out


_CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
_DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "clipiqa.npz")

GOOD_BAD_IDS_VITL = None  # filled by callers with a real tokenizer


def save_clipiqa_weights(params: Dict, path: str,
                         vision_cfg: Optional[CLIPVisionConfig] = None,
                         text_cfg: Optional["CLIPTextConfig"] = None,
                         eos_token_id: int = 49407,
                         prompt_ids: Optional[np.ndarray] = None,
                         prompt_embeds: Optional[np.ndarray] = None) -> None:
    """Write a self-contained CLIPIQA npz: converted params plus the model
    configs (JSON under `_config`) and the antonym prompts, so the harness
    can reconstruct the metric from the file alone."""
    import dataclasses
    import json

    from .lpips import save_lpips_params

    extra: Dict = {}
    if vision_cfg is not None and text_cfg is not None:
        extra["_config"] = np.asarray(json.dumps({
            "vision": dataclasses.asdict(vision_cfg),
            "text": dataclasses.asdict(text_cfg),
            "eos_token_id": eos_token_id,
        }))
    if prompt_ids is not None:
        extra["_prompt_ids"] = np.asarray(prompt_ids, np.int32)
    if prompt_embeds is not None:
        extra["_prompt_embeds"] = np.asarray(prompt_embeds, np.float32)
    save_lpips_params({**params, **extra}, path)


def make_clipiqa(weights_path: Optional[str] = None,
                 prompt_ids: Optional[np.ndarray] = None,
                 prompt_embeds: Optional[np.ndarray] = None,
                 resolution: int = 512):
    """CLIPIQA callable `(img in [0,1]) -> float`, or None without weights.

    `prompt_ids` [2, 77] tokenizes ("Good photo.", "Bad photo."); CLIPIQA+
    checkpoints provide learned `prompt_embeds` [2, proj] instead. The
    weights npz may carry either under the reserved keys `_prompt_ids` /
    `_prompt_embeds`, making the file self-contained for the harness."""
    from .lpips import load_lpips_params

    path = weights_path or _DEFAULT_WEIGHTS
    if not os.path.exists(path):
        return None
    tree = load_lpips_params(path)
    if prompt_ids is None and prompt_embeds is None:
        prompt_ids = tree.pop("_prompt_ids", None)
        prompt_embeds = tree.pop("_prompt_embeds", None)
    else:
        tree.pop("_prompt_ids", None)
        tree.pop("_prompt_embeds", None)
    if prompt_ids is None and prompt_embeds is None:
        return None
    cfg_blob = tree.pop("_config", None)
    eos_token_id = 49407
    if cfg_blob is not None:
        import json

        cfg = json.loads(str(np.asarray(cfg_blob)))
        vision_cfg = CLIPVisionConfig(**cfg["vision"])
        text_cfg = CLIPTextConfig(**cfg["text"])
        eos_token_id = int(cfg.get("eos_token_id", eos_token_id))
    else:
        vision_cfg, text_cfg = clip_vit_l14_configs()
    params = {"params": tree}
    model = CLIPIQA(vision_cfg, text_cfg, eos_token_id=eos_token_id)
    apply = jax.jit(model.apply)

    def call(img: np.ndarray) -> float:
        from PIL import Image

        if img.dtype != np.uint8:
            img = np.uint8(np.clip(img, 0, 1) * 255)
        img = np.asarray(Image.fromarray(img).resize(
            (resolution, resolution), Image.BICUBIC))
        x = (img.astype(np.float32) / 255.0 - _CLIP_MEAN) / _CLIP_STD
        kw = {}
        if prompt_embeds is not None:
            kw["prompt_embeds"] = jnp.asarray(prompt_embeds)
        else:
            kw["prompt_ids"] = jnp.asarray(prompt_ids)
        return float(apply(params, jnp.asarray(x)[None], **kw)[0])

    return call
