"""Generate full-model checkpoint key/shape manifests (round-4 verdict #2).

Records the COMPLETE key set + shapes of every checkpoint the restore /
caption CLIs consume, so `tests/test_model_manifests.py` can synthesize
manifest-shaped state dicts and prove the converters + flax models consume
the released layouts at FULL scale (the `tests/manifests/` pattern that
round 3 built for the IQA metrics, now applied to the models themselves).

Provenance per manifest:
- `sdxl_unet_diffusers.json` / `sdxl_vae_fp16_fix.json` /
  `faithdiff_bin.json`: generated from `tests/torch_sdxl_ref.py` — the
  deliberate torch transcription of the reference/diffusers modules whose
  state-dict naming is the diffusers layout (proven by the round-2/3 parity
  tests, which feed its tiny-config state dicts through `convert_unet` /
  `convert_vae` / `convert_denoise_encoder`) — instantiated at the FULL
  SDXL configuration (`UNetConfig()` defaults = sdxl-base-1.0
  `unet/config.json`; VAE = madebyollin/sdxl-vae-fp16-fix architecture,
  identical to sdxl-base `vae/config.json`). The FaithDiff.bin flat layout
  adds the reference's five extra namespaces
  (`unet_2d_condition_vae_extension.py:444-478`): core UNet keys +
  `denoise_encoder.*` (headless VAE encoder, `:39-196`) +
  `information_transformer_layes.*` + `spatial_ch_projs.*` (`:393-399`) +
  `condition_embedding.*` (`:199-219`, channel=512) + `agg_net.*` (empty
  ModuleList `:403` — zero keys).
- `clip_text_l.json` / `clip_text_bigg.json` / `clip_vision_vit_l_336.json`
  / `llava_13b.json`: generated from the INSTALLED transformers classes at
  the released configurations — these ARE the released layouts
  (text_encoder = openai/clip-vit-large-patch14, text_encoder_2 =
  laion CLIP-bigG, vision tower = clip-vit-large-patch14-336 per
  `CKPT_PTH.py:1`, LM = llava-v1.5-13b = LLaMA-13B + `model.mm_projector`
  mlp2x_gelu per `llava/model/builder.py:26-148`,
  `llava_arch.py:29-97`).

Models are instantiated on the torch `meta` device (shape-only, no
allocation); run time is seconds.
"""
from __future__ import annotations

import json
import os
import sys

import torch

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, _REPO)

MANIFEST_DIR = os.path.join(_REPO, "tests", "manifests")


def _shapes(state_dict) -> dict:
    out = {}
    for k, v in state_dict.items():
        if v.dtype == torch.int64:
            out[k] = "int64"
        else:
            out[k] = list(v.shape)
    return out


def _write(name: str, manifest: dict):
    path = os.path.join(MANIFEST_DIR, name)
    with open(path, "w") as f:
        json.dump(manifest, f, indent=0, sort_keys=True)
    print(f"{name}: {len(manifest)} keys")


def _meta(model_ctor):
    try:
        with torch.device("meta"):
            return model_ctor()
    except Exception:
        # some inits reject meta tensors; fall back to real (slow) init
        return model_ctor()


def gen_sdxl():
    from faithdiff_tpu.config import UNetConfig
    from torch_sdxl_ref import AutoencoderKL, Encoder, FaithDiffUNet

    cfg = UNetConfig()  # full SDXL defaults
    unet = _meta(lambda: FaithDiffUNet(cfg))
    unet_sd = _shapes(unet.state_dict())

    extras_prefixes = ("condition_embedding.", "information_transformer_layes.",
                       "spatial_ch_projs.")
    core = {k: v for k, v in unet_sd.items()
            if not k.startswith(extras_prefixes)}
    _write("sdxl_unet_diffusers.json", core)

    vae = _meta(lambda: AutoencoderKL(
        block_out_channels=(128, 256, 512, 512), layers_per_block=2,
        latent_channels=4, groups=32))
    _write("sdxl_vae_fp16_fix.json", _shapes(vae.state_dict()))

    # FaithDiff.bin flat layout: full fine-tuned UNet + extras + the
    # headless denoise_encoder (agg_net is an empty ModuleList: no keys)
    de = _meta(lambda: Encoder(
        block_out_channels=(128, 256, 512, 512), layers_per_block=2,
        in_channels=3, with_head=False, mid_attention=True))
    flat = dict(unet_sd)
    for k, v in _shapes(de.state_dict()).items():
        flat[f"denoise_encoder.{k}"] = v
    _write("faithdiff_bin.json", flat)


def gen_clip_text():
    from transformers import (CLIPTextConfig, CLIPTextModel,
                              CLIPTextModelWithProjection)

    # text_encoder: openai/clip-vit-large-patch14 (SDXL text_encoder config)
    cfg_l = CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu",
        projection_dim=768)
    m = _meta(lambda: CLIPTextModel(cfg_l))
    _write("clip_text_l.json", _shapes(m.state_dict()))

    # text_encoder_2: laion CLIP-ViT-bigG-14 text tower (SDXL
    # text_encoder_2 config: 32 layers, d=1280, gelu, with projection)
    cfg_g = CLIPTextConfig(
        vocab_size=49408, hidden_size=1280, intermediate_size=5120,
        num_hidden_layers=32, num_attention_heads=20,
        max_position_embeddings=77, hidden_act="gelu",
        projection_dim=1280)
    m2 = _meta(lambda: CLIPTextModelWithProjection(cfg_g))
    _write("clip_text_bigg.json", _shapes(m2.state_dict()))


def gen_clip_vision():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    # openai/clip-vit-large-patch14-336 (`CKPT_PTH.py:1`,
    # `clip_encoder.py:5,13`)
    cfg = CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=336, patch_size=14,
        projection_dim=768, hidden_act="quick_gelu")
    m = _meta(lambda: CLIPVisionModel(cfg))
    _write("clip_vision_vit_l_336.json", _shapes(m.state_dict()))


def gen_llava_13b():
    from transformers import LlamaConfig, LlamaForCausalLM

    # llava-v1.5-13b: LLaMA-13B LM + mlp2x_gelu projector (mm_hidden_size
    # 1024 -> 5120). The vision tower ships as a separate checkpoint
    # (`builder.py:137-141` loads it from LLAVA_CLIP_PATH), so it is NOT in
    # this manifest.
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=40, num_attention_heads=40,
        max_position_embeddings=4096, rms_norm_eps=1e-5)
    m = _meta(lambda: LlamaForCausalLM(cfg))
    sd = _shapes(m.state_dict())
    sd["model.mm_projector.0.weight"] = [5120, 1024]
    sd["model.mm_projector.0.bias"] = [5120]
    sd["model.mm_projector.2.weight"] = [5120, 5120]
    sd["model.mm_projector.2.bias"] = [5120]
    _write("llava_13b.json", sd)


if __name__ == "__main__":
    os.makedirs(MANIFEST_DIR, exist_ok=True)
    gen_sdxl()
    gen_clip_text()
    gen_clip_vision()
    gen_llava_13b()
