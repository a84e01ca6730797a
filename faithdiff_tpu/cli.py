"""Command-line entry points.

Mirrors the reference scripts (SURVEY.md §2.3):
- `restore`  ~ `/root/reference/test_wo_llava.py` (captions from JSON) and
  `test.py` when a captioner checkpoint is available
- `caption`  ~ `test_generate_caption.py`
- `train`    ~ `train_SDXL_stage_1.py` / `train_SDXL_stage_2.py`
- `metrics`  ~ `test_metrics.py`

Usage: python -m faithdiff_tpu.cli <command> [flags]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from typing import Optional

import numpy as np


def _add_restore_args(p: argparse.ArgumentParser):
    """Flags mirror `/root/reference/test.py:29-49`."""
    p.add_argument("--img_dir", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--json_dir", default=None,
                   help="caption JSONs per image (test_wo_llava path)")
    p.add_argument("--upscale", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--latent_tiled_size", type=int, default=1024,
                   help="pixel-space tile edge (latent = /8)")
    p.add_argument("--latent_tiled_overlap", type=float, default=0.5)
    p.add_argument("--color_fix", choices=["wavelet", "adain", "nofix"],
                   default="wavelet")
    p.add_argument("--start_point", choices=["lr", "noise"], default="lr")
    p.add_argument("--use_tile_vae", action="store_true")
    p.add_argument("--use_fp8", action="store_true",
                   help="store UNet weights as float8 (min-HBM mode, "
                        "mirrors the reference --use_fp8)")
    p.add_argument("--hdr", type=float, default=0.0)
    p.add_argument("--checkpoint_dir", default=None,
                   help="dir with converted params (unet/ vae/ denoise_encoder/ text_encoder*/); omit for random init")
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--tile_devices", type=int, default=1)
    p.add_argument("--negative_prompt", default="",
                   help="real negative prompt text (reference encode_prompt, "
                        "`pipeline_FaithDiff_tlc.py:485-717`); empty keeps "
                        "the force-zeros-for-empty-prompt default")
    p.add_argument("--canvas_resume_dir", default=None,
                   help="per-step canvas checkpointing: a crashed "
                        "large-image run resumes at the next denoise step "
                        "on re-invocation (host-driven path only)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny test-config models (CI smoke runs)")


def load_checkpointed_pipeline(args):
    """Build the pipeline from converted checkpoints on disk."""
    import jax.numpy as jnp

    from .config import (PipelineConfig, tiny_denoise_encoder_config,
                         tiny_unet_config, tiny_vae_config)
    from .pipelines.factory import build_pipeline
    from .training.checkpoint import load_params

    def maybe(path):
        if not args.checkpoint_dir:
            return None
        full = os.path.join(args.checkpoint_dir, path)
        return load_params(full) if os.path.exists(full) else None

    def wrap(p):
        return {"params": p} if p is not None and "params" not in p else p

    pipeline_config = PipelineConfig(
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        tile_size=args.latent_tiled_size,
        tile_overlap=args.latent_tiled_overlap,
        start_point=args.start_point,
        color_fix=args.color_fix,
        use_tiled_vae=args.use_tile_vae,
    )
    kwargs = {}
    if args.tiny:
        kwargs = dict(unet_config=tiny_unet_config(),
                      vae_config=tiny_vae_config(),
                      denoise_encoder_config=tiny_denoise_encoder_config(),
                      dtype=jnp.float32)
    else:
        kwargs = dict(dtype=jnp.bfloat16)
    return build_pipeline(
        pipeline_config=pipeline_config,
        use_fp8=getattr(args, "use_fp8", False),
        unet_params=wrap(maybe("unet")),
        vae_params=wrap(maybe("vae")),
        denoise_encoder_params=wrap(maybe("denoise_encoder")),
        tile_devices=args.tile_devices,
        **kwargs,
    )


def _make_text_encoder(args):
    """Text -> (prompt_embeds, pooled) closure over the SDXL towers, or None
    when no text-encoder checkpoint is present (unconditional restore)."""
    import jax.numpy as jnp

    te_dir = (os.path.join(args.checkpoint_dir, "text_encoders")
              if args.checkpoint_dir else "")
    if not (args.tokenizer_dir and te_dir and os.path.exists(te_dir)):
        return None
    from .models.clip_text import SDXLTextEncoder
    from .models.tokenizer import SDXLTokenizer
    from .training.checkpoint import load_params

    tok = SDXLTokenizer(
        os.path.join(args.tokenizer_dir, "tokenizer"),
        os.path.join(args.tokenizer_dir, "tokenizer_2"))
    enc = SDXLTextEncoder(dtype=jnp.bfloat16)
    params = {"params": load_params(te_dir)}

    def encode(text: str):
        ids_1, ids_2 = tok(text)
        pe, pooled = enc.apply(params, jnp.asarray(ids_1),
                               jnp.asarray(ids_2))
        return pe.astype(jnp.float32), pooled.astype(jnp.float32)

    return encode


def _zero_embeds(cross_dim: int, pooled_dim: int):
    import jax.numpy as jnp

    return (jnp.zeros((1, 77, cross_dim), jnp.float32),
            jnp.zeros((1, pooled_dim), jnp.float32))


def cmd_restore(argv):
    from PIL import Image

    from .data.dataset import trim_caption
    from .utils.image import check_image_size, create_hdr_effect, resize_lanczos

    p = argparse.ArgumentParser("restore")
    _add_restore_args(p)
    args = p.parse_args(argv)

    pipe = load_checkpointed_pipeline(args)
    encode = _make_text_encoder(args)
    if args.negative_prompt and encode is None:
        print("WARNING: --negative_prompt ignored (no text-encoder "
              "checkpoint); using zero negative embeds")
    os.makedirs(args.save_dir, exist_ok=True)
    images = sorted(sum([glob.glob(os.path.join(args.img_dir, e))
                         for e in ("*.png", "*.jpg", "*.jpeg")], []))
    for path in images:
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.save_dir, f"{name}.png")
        if os.path.exists(out_path):  # skip-if-exists resume (`test.py:84-93`)
            print(f"skip {name}")
            continue
        img = np.asarray(Image.open(path).convert("RGB"))

        caption = ""
        if args.json_dir:
            jpath = os.path.join(args.json_dir, f"{name}.json")
            if os.path.exists(jpath):
                with open(jpath) as f:
                    caption = trim_caption(json.load(f)["caption"])

        if args.hdr > 0:
            img = create_hdr_effect(img, args.hdr)
        # LANCZOS x upscale then /8 pad (`test.py:122-126`)
        h, w = img.shape[:2]
        img = resize_lanczos(img, (w * args.upscale, h * args.upscale))
        padded, w0, h0, w1, h1 = check_image_size(img)
        lr = padded  # uint8 straight through: 4x smaller host->device upload

        cross_dim = 64 if args.tiny else 2048
        pooled_dim = 64 if args.tiny else 1280
        if encode is not None:
            pe, pooled = encode(caption)
        else:
            pe, pooled = _zero_embeds(cross_dim, pooled_dim)
        neg_pe = neg_pooled = None
        if args.negative_prompt and encode is not None:
            neg_pe, neg_pooled = encode(args.negative_prompt)
        ck = ({"checkpoint_dir": os.path.join(
                  args.canvas_resume_dir, os.path.splitext(name)[0])}
              if args.canvas_resume_dir else {})
        out = pipe(lr, pe, pooled, seed=args.seed,
                   negative_prompt_embeds=neg_pe,
                   negative_pooled_prompt_embeds=neg_pooled,
                   output_type="uint8", **ck)  # quantize on device: 4x readback
        out = out[:h0, :w0]  # crop the /8 padding back off
        Image.fromarray(out).save(out_path)
        print(f"restored {name} -> {out_path}")


def cmd_caption(argv):
    p = argparse.ArgumentParser("caption")
    p.add_argument("--img_dir", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--captioner_dir", required=True)
    p.add_argument("--use_bsrnet", action="store_true")
    args = p.parse_args(argv)
    from .captioner.agent import CaptionAgent

    agent = CaptionAgent.from_checkpoint(args.captioner_dir)
    os.makedirs(args.save_dir, exist_ok=True)
    from PIL import Image

    for path in sorted(glob.glob(os.path.join(args.img_dir, "*"))):
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.save_dir, f"{name}.json")
        if os.path.exists(out_path):
            continue
        img = np.asarray(Image.open(path).convert("RGB"))
        caption = agent.caption(img)
        with open(out_path, "w") as f:
            json.dump({"caption": caption}, f)
        print(f"{name}: {caption[:80]}")


def cmd_embed(argv):
    """Precompute stem-keyed prompt embeddings for training, including the
    mandatory null-prompt embedding consumed by caption dropout
    (reference flow: `Realesrgan_offline_dataset.py:231-261` tokenizes the
    dropped caption to the null ids; we precompute its embedding once)."""
    import jax
    import jax.numpy as jnp

    from .config import CLIPTextConfig
    from .models.clip_text import SDXLTextEncoder
    from .training.text_embeds import precompute_embeds

    p = argparse.ArgumentParser("embed")
    p.add_argument("--caption_dir", required=True,
                   help=".txt or .json caption files, one per sample stem")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--tokenizer_dir", default=None,
                   help="dir with tokenizer/ tokenizer_2/; omit for the "
                        "hash tokenizer (smoke runs only)")
    p.add_argument("--text_encoder_dir", default=None,
                   help="converted SDXL text-tower params; omit for random "
                        "init (smoke runs only)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny text towers (CI smoke runs)")
    p.add_argument("--no_trim", action="store_true")
    args = p.parse_args(argv)

    if args.tokenizer_dir:
        from .models.tokenizer import SDXLTokenizer

        tok = SDXLTokenizer(os.path.join(args.tokenizer_dir, "tokenizer"),
                            os.path.join(args.tokenizer_dir, "tokenizer_2"))
    else:
        from .models.tokenizer import HashTokenizer

        print("WARNING: no --tokenizer_dir; using the hash tokenizer "
              "(smoke runs only)")
        tok = HashTokenizer(vocab_size=128 if args.tiny else 49408)

    if args.tiny:
        tiny = CLIPTextConfig(vocab_size=128, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=2,
                              num_attention_heads=4)
        tiny2 = CLIPTextConfig(vocab_size=128, hidden_size=32,
                               intermediate_size=64, num_hidden_layers=2,
                               num_attention_heads=4, projection_dim=64)
        enc = SDXLTextEncoder(config_1=tiny, config_2=tiny2)
    else:
        enc = SDXLTextEncoder(dtype=jnp.bfloat16)

    if args.text_encoder_dir:
        from .training.checkpoint import load_params

        params = {"params": load_params(args.text_encoder_dir)}
    else:
        print("WARNING: no --text_encoder_dir; random-init towers "
              "(smoke runs only)")
        ids = tok("probe")
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids[0]),
                          jnp.asarray(ids[1]))

    apply = jax.jit(enc.apply)

    def encode(ids_1, ids_2):
        return apply(params, jnp.asarray(ids_1), jnp.asarray(ids_2))

    files = sorted(sum([glob.glob(os.path.join(args.caption_dir, e))
                        for e in ("*.txt", "*.json")], []))
    n = precompute_embeds(files, args.save_dir, tok, encode,
                          trim=not args.no_trim)
    print(f"wrote {n} embedding files to {args.save_dir} "
          f"(incl. the null-prompt embedding)")


def cmd_train(argv):
    from .training.runner import main as train_main

    train_main(argv)


def cmd_metrics(argv):
    from .eval.metrics import main as metrics_main

    metrics_main(argv)


COMMANDS = {
    "restore": cmd_restore,
    "caption": cmd_caption,
    "embed": cmd_embed,
    "train": cmd_train,
    "metrics": cmd_metrics,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in COMMANDS:
        print(f"usage: python -m faithdiff_tpu.cli {{{'|'.join(COMMANDS)}}} ...")
        return 1
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main() or 0)
