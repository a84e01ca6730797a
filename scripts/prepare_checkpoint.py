"""Convert released checkpoint files into the restore CLI's layout.

The reference factory downloads + split-loads released files at run time
(`/root/reference/FaithDiff/create_FaithDiff_model.py:11-37`:
RealVisXL/SDXL unet + jychen9811/FaithDiff `FaithDiff.bin` +
sdxl-vae-fp16-fix + dual CLIP text encoders, paths in `CKPT_PTH.py`).
Our `cli.py restore` instead consumes a directory of CONVERTED param
trees (`cli.py:61-104`: `unet/ vae/ denoise_encoder/ text_encoders/`).
This is the one-time converter between the two worlds:

    python scripts/prepare_checkpoint.py \
        --faithdiff_bin /path/FaithDiff.bin \
        --unet /path/unet/diffusion_pytorch_model.[safetensors|bin] \
        --vae /path/sdxl-vae-fp16-fix/diffusion_pytorch_model.safetensors \
        --text_encoder /path/text_encoder/model.safetensors \
        --text_encoder_2 /path/text_encoder_2/model.safetensors \
        --out /path/converted_ckpt

The captioner branch converts the same way (reference builder:
`llava/model/builder.py:26-148` loads llava-v1.5-13b + the separate
openai/clip-vit-large-patch14-336 tower):

    python scripts/prepare_checkpoint.py \
        --llava /path/llava-v1.5-13b/pytorch_model.bin \
        --clip_vision /path/clip-vit-large-patch14-336/model.safetensors \
        --out /path/converted_ckpt
    # -> converted_ckpt/captioner/{llama,projector,vision}; copy the real
    # tokenizer files into converted_ckpt/captioner/tokenizer/ and point
    # `cli.py caption --captioner_dir` at converted_ckpt/captioner

Layout notes (all verified against full-scale manifests in
`tests/test_model_manifests.py` / `tests/manifests/`):
- FaithDiff.bin is FLAT: core UNet keys (loaded non-strict over the SDXL
  base) + 5 extra namespaces loaded strict
  (`unet_2d_condition_vae_extension.py:444-478`). Core keys PRESENT in
  the bin override the base SDXL unet, mirroring the reference's
  non-strict load-over.
- The denoise_encoder lives in its own tree (our pipeline wires it like
  the reference wires `pipe.denoise_encoder`).
- text_encoders/ holds the SDXLTextEncoder two-tower tree
  (`text_encoder`/`text_encoder_2` submodules).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(path):
    from faithdiff_tpu.utils.convert import load_safetensors, load_torch_bin

    if path.endswith(".index.json"):
        return _load_sharded(path)
    if os.path.isfile(path):
        if path.endswith(".safetensors"):
            return load_safetensors(path)
        return load_torch_bin(path)
    # released llava-v1.5-13b ships as sharded bins + an index json
    # (`pytorch_model.bin.index.json` naming the per-key shard files);
    # accept the directory or a missing single-file path and fall back
    # to the index
    d = path if os.path.isdir(path) else os.path.dirname(path) or "."
    for idx in ("pytorch_model.bin.index.json",
                "model.safetensors.index.json"):
        p = os.path.join(d, idx)
        if os.path.isfile(p):
            return _load_sharded(p)
    raise FileNotFoundError(
        f"{path}: not a file, and no *.index.json found in {d}")


def _load_sharded(index_path):
    """Load and merge a HF-style sharded checkpoint via its index json."""
    import json

    from faithdiff_tpu.utils.convert import load_safetensors, load_torch_bin

    with open(index_path) as f:
        weight_map = json.load(f)["weight_map"]
    d = os.path.dirname(index_path) or "."
    merged = {}
    for shard in sorted(set(weight_map.values())):
        p = os.path.join(d, shard)
        sd = (load_safetensors(p) if p.endswith(".safetensors")
              else load_torch_bin(p))
        merged.update(sd)
    missing = set(weight_map) - set(merged)
    if missing:
        raise KeyError(f"{index_path}: {len(missing)} keys named in the "
                       f"index are absent from the shards, e.g. "
                       f"{sorted(missing)[:3]}")
    return merged


def prepare(faithdiff_bin=None, unet=None, vae=None, text_encoder=None,
            text_encoder_2=None, llava=None, clip_vision=None,
            out="converted_ckpt", state_dicts=None) -> dict:
    """Convert and save; returns {component: n_leaves}. `state_dicts` lets
    tests inject already-loaded dicts keyed by the same names."""
    from faithdiff_tpu.training.checkpoint import save_params
    from faithdiff_tpu.utils.convert import (convert_clip_text,
                                             convert_denoise_encoder,
                                             convert_faithdiff_unet,
                                             convert_state_dict, convert_vae,
                                             split_faithdiff_bin)

    sd = dict(state_dicts or {})

    def get(name, path):
        if name in sd:
            return sd[name]
        return _load(path) if path else None

    import jax
    os.makedirs(out, exist_ok=True)
    written = {}

    fd = get("faithdiff_bin", faithdiff_bin)
    base = get("unet", unet)
    if fd is not None:
        core, extras = split_faithdiff_bin(fd)
        if base is not None:
            # reference semantics: bin's core keys override the base SDXL
            # unet via the non-strict load (`:444-478`)
            merged = dict(base)
            merged.update(core)
            core = merged
        unet_params = convert_faithdiff_unet(core, extras)
        save_params(os.path.join(out, "unet"), unet_params)
        written["unet"] = len(jax.tree.leaves(unet_params))
        de = convert_denoise_encoder(extras["denoise_encoder"])
        save_params(os.path.join(out, "denoise_encoder"), de)
        written["denoise_encoder"] = len(jax.tree.leaves(de))
    elif base is not None:
        unet_params = convert_state_dict(base)
        save_params(os.path.join(out, "unet"), unet_params)
        written["unet"] = len(jax.tree.leaves(unet_params))

    v = get("vae", vae)
    if v is not None:
        vp = convert_vae(v)
        save_params(os.path.join(out, "vae"), vp)
        written["vae"] = len(jax.tree.leaves(vp))

    te1 = get("text_encoder", text_encoder)
    te2 = get("text_encoder_2", text_encoder_2)
    if te1 is not None and te2 is not None:
        tree = {"text_encoder": convert_clip_text(te1),
                "text_encoder_2": convert_clip_text(te2,
                                                    with_projection=True)}
        save_params(os.path.join(out, "text_encoders"), tree)
        written["text_encoders"] = len(jax.tree.leaves(tree))

    lv = get("llava", llava)
    if lv is not None:
        # released llava-v1.5 checkpoint layout: LM keys + model.mm_projector
        # (the CLIP tower ships separately — openai/clip-vit-large-patch14-336
        # — exactly as the reference builder loads it,
        # `llava/model/builder.py:137-141`)
        from faithdiff_tpu.utils.convert import (convert_llama,
                                                 convert_vision_projector)

        cap_dir = os.path.join(out, "captioner")
        lm_sd = {k: t for k, t in lv.items()
                 if not k.startswith("model.mm_projector.")}
        lp = convert_llama(lm_sd)
        save_params(os.path.join(cap_dir, "llama"), lp)
        written["captioner/llama"] = len(jax.tree.leaves(lp))
        del lm_sd, lp
        proj_sd = {k[len("model.mm_projector."):]: t for k, t in lv.items()
                   if k.startswith("model.mm_projector.")}
        pp = convert_vision_projector(proj_sd)
        save_params(os.path.join(cap_dir, "projector"), pp)
        written["captioner/projector"] = len(jax.tree.leaves(pp))

    # the CLIP tower is an independent released file: convert it whenever
    # given, with or without --llava
    cv = get("clip_vision", clip_vision)
    if cv is not None:
        from faithdiff_tpu.utils.convert import convert_clip_vision

        vp = convert_clip_vision(cv)
        save_params(os.path.join(out, "captioner", "vision"), vp)
        written["captioner/vision"] = len(jax.tree.leaves(vp))
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--faithdiff_bin", default=None)
    ap.add_argument("--unet", default=None,
                    help="base SDXL unet state dict (diffusers layout)")
    ap.add_argument("--vae", default=None)
    ap.add_argument("--text_encoder", default=None)
    ap.add_argument("--text_encoder_2", default=None)
    ap.add_argument("--llava", default=None,
                    help="released llava-v1.5 LM checkpoint "
                    "(pytorch_model.bin / model.safetensors; LM + "
                    "mm_projector keys) -> captioner/{llama,projector}")
    ap.add_argument("--clip_vision", default=None,
                    help="openai/clip-vit-large-patch14-336 state dict "
                    "-> captioner/vision")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    written = prepare(**vars(args))
    for k, n in written.items():
        print(f"[prepare_checkpoint] {k}: {n} tensors")
    if not written:
        print("[prepare_checkpoint] nothing to convert (no inputs given)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
