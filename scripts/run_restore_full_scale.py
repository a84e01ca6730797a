"""Execute `cli.py restore` at FULL SDXL scale from converted released-layout
checkpoint files (the re-runnable form of the round-4 restore execution;
twin of `run_caption_full_scale.py`).

Flow (mirrors what a user with the real weights would do):
  1. synthesize manifest-shaped state dicts for the released files the
     reference factory loads (`create_FaithDiff_model.py:11-37`): SDXL base
     UNet (diffusers fp16), flat FaithDiff.bin, sdxl-vae-fp16-fix, and the
     two CLIP text towers (`tests/manifests/*.json` record the real released
     key/shape sets; weights are synthetic — this proves EXECUTION of the
     released layouts end-to-end, not output quality);
  2. `scripts/prepare_checkpoint.py` conversion into the CLI's
     `{unet,denoise_encoder,vae,text_encoders}` layout (core-over-base
     non-strict semantics of `unet_2d_condition_vae_extension.py:444-478`);
  3. write synthetic CLIP-BPE tokenizer dirs (vocab.json + merges.txt —
     weights-adjacent assets we cannot download here; CLIPTokenizer loads
     them the same way as the SDXL repo's tokenizer/ + tokenizer_2/);
  4. run `cli.py restore` with a caption json (the `test_wo_llava.py` flow:
     LANCZOS x2 upscale, /8 pad, dual-tower prompt encoding, tiled denoise,
     decode, wavelet color fix) on the TPU chip -> PNG.

Reference flow being proven: `test.py:57-140` / `test_wo_llava.py:67-98`.

Usage: python scripts/run_restore_full_scale.py [--workdir DIR]
       [--size N] [--steps N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tests"))
sys.path.insert(0, _HERE)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(_HERE), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def make_clip_tokenizer_dir(path: str) -> None:
    """Synthetic CLIP-BPE files loadable by `transformers.CLIPTokenizer`:
    a character-level vocab (every printable char with and without the
    CLIP end-of-word marker) and an empty merge list, standing in for the
    real 49408-entry BPE the SDXL repo ships."""
    import string

    os.makedirs(path, exist_ok=True)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for c in string.ascii_lowercase + string.digits + ".,!? ":
        for form in (c, c + "</w>"):
            if form not in vocab:
                vocab[form] = len(vocab)
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/restore_full_scale")
    ap.add_argument("--size", type=int, default=512,
                    help="input image side; x2 upscale -> 2*size output")
    ap.add_argument("--steps", type=int, default=4,
                    help="denoise steps (reference default 20; bounded so "
                    "the proof run fits a session)")
    args = ap.parse_args()

    import numpy as np

    from prepare_checkpoint import prepare
    from test_model_manifests import load_manifest, synth_sd

    os.makedirs(args.workdir, exist_ok=True)
    ckpt = os.path.join(args.workdir, "ckpt")

    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(ckpt, "unet")):
        print("[restore-full] synthesizing released-layout state dicts "
              "(SDXL unet + FaithDiff.bin + fp16-fix VAE + text towers)...",
              flush=True)
        sds = {
            "unet": synth_sd(load_manifest("sdxl_unet_diffusers.json")),
            "faithdiff_bin": synth_sd(load_manifest("faithdiff_bin.json")),
            "vae": synth_sd(load_manifest("sdxl_vae_fp16_fix.json")),
            "text_encoder": synth_sd(load_manifest("clip_text_l.json")),
            "text_encoder_2": synth_sd(load_manifest("clip_text_bigg.json")),
        }
        print(f"[restore-full] converting "
              f"({time.perf_counter()-t0:.0f}s)...", flush=True)
        written = prepare(out=ckpt, state_dicts=sds)
        print(f"[restore-full] written: {written} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
        del sds
    tok_root = os.path.join(ckpt, "tokenizers")
    for sub in ("tokenizer", "tokenizer_2"):
        d = os.path.join(tok_root, sub)
        if not os.path.exists(d):
            make_clip_tokenizer_dir(d)

    img_dir = os.path.join(args.workdir, "in")
    json_dir = os.path.join(args.workdir, "caps")
    out_dir = os.path.join(args.workdir, "out")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(json_dir, exist_ok=True)
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(
        0, 255, (args.size, args.size, 3), np.uint8)).save(
        os.path.join(img_dir, "x.png"))
    with open(os.path.join(json_dir, "x.json"), "w") as f:
        json.dump({"caption": "a photo of a building facade, sharp details, "
                              "high quality. second sentence for the "
                              "trimmer."}, f)
    out_png = os.path.join(out_dir, "x.png")
    if os.path.exists(out_png):
        os.remove(out_png)   # defeat skip-if-exists across re-runs

    from faithdiff_tpu.cli import main as cli_main

    print(f"[restore-full] running cli restore at {args.size}^2 x2 "
          f"({time.perf_counter()-t0:.0f}s)...", flush=True)
    cli_main(["restore", "--img_dir", img_dir, "--save_dir", out_dir,
              "--json_dir", json_dir, "--checkpoint_dir", ckpt,
              "--tokenizer_dir", tok_root, "--upscale", "2",
              "--num_inference_steps", str(args.steps)])
    out = np.asarray(Image.open(out_png))
    assert out.shape == (args.size * 2, args.size * 2, 3), out.shape
    print(json.dumps({
        "event": "restore_cli_full_scale_executed",
        "input": f"{args.size}x{args.size}",
        "output": f"{out.shape[1]}x{out.shape[0]}",
        "steps": args.steps,
        "wall_s": round(time.perf_counter() - t0, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
