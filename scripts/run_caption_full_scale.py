"""Execute `cli.py caption` at FULL 13B scale from converted released-layout
checkpoint files (the caption twin of the round-4 restore-CLI execution).

Flow (mirrors what a user with the real weights would do):
  1. synthesize manifest-shaped state dicts for llava-v1.5-13b and
     clip-vit-large-patch14-336 (`tests/manifests/*.json` record the real
     released key/shape sets; weights are synthetic — this proves
     EXECUTION of the released layouts, not quality);
  2. `scripts/prepare_checkpoint.py --llava --clip_vision` conversion into
     the `captioner/{llama,vision,projector}` layout;
  3. write a local word-level tokenizer dir (stands in for the real
     sentencepiece files, which are weights-adjacent assets we cannot
     download here; AutoTokenizer loads it the same way);
  4. run `cli.py caption` on a small image -> caption JSON, int8 13B LM on
     the TPU chip.

Reference flow being proven: `test_generate_caption.py:30-68` +
`llava/model/builder.py:26-148`.

Usage: python scripts/run_caption_full_scale.py [--workdir DIR]
       [--max_new_tokens N]
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
sys.path.insert(0, _HERE)  # `from prepare_checkpoint import ...` must work
# even when this module is imported rather than run as a script


def make_tokenizer_dir(path: str) -> None:
    from tokenizers import AddedToken, Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    words = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(3, 2000):
        words[f"w{i}"] = i
    tok = Tokenizer(models.WordLevel(words, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    # register the specials as AddedTokens so they are matched BEFORE the
    # Whitespace pre-tokenizer (which would otherwise shred "</s>" into
    # punctuation pieces mapped to <unk>, making the agent's stop-sequence
    # a run of unk ids)
    tok.add_special_tokens([AddedToken(t, special=True)
                            for t in ("<unk>", "<s>", "</s>")])
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                                   bos_token="<s>", eos_token="</s>")
    assert fast.encode("</s>", add_special_tokens=False) == [2], \
        "special tokens must round-trip to their real ids"
    fast.save_pretrained(path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/caption_full_scale")
    ap.add_argument("--max_new_tokens", type=int, default=32)
    args = ap.parse_args()

    import numpy as np

    from prepare_checkpoint import prepare
    from test_model_manifests import load_manifest, synth_sd

    os.makedirs(args.workdir, exist_ok=True)
    ckpt = os.path.join(args.workdir, "ckpt")

    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(ckpt, "captioner", "llama")):
        print("[caption-full] synthesizing released-layout state dicts "
              "(llava-v1.5-13b + clip-vit-large-patch14-336)...", flush=True)
        llava_sd = synth_sd(load_manifest("llava_13b.json"))
        clip_sd = synth_sd(load_manifest("clip_vision_vit_l_336.json"))
        print(f"[caption-full] converting ({time.perf_counter()-t0:.0f}s)...",
              flush=True)
        written = prepare(out=ckpt, state_dicts={
            "llava": llava_sd, "clip_vision": clip_sd})
        print(f"[caption-full] written: {written} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
        del llava_sd, clip_sd
    cap_dir = os.path.join(ckpt, "captioner")
    tok_dir = os.path.join(cap_dir, "tokenizer")
    if not os.path.exists(tok_dir):
        make_tokenizer_dir(tok_dir)

    img_dir = os.path.join(args.workdir, "in")
    out_dir = os.path.join(args.workdir, "caps")
    os.makedirs(img_dir, exist_ok=True)
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (336, 336, 3), np.uint8)).save(
        os.path.join(img_dir, "x.png"))

    # cap the generation so the proof run is bounded (the real default is
    # 512; `CaptionAgent.max_new_tokens`)
    import faithdiff_tpu.captioner.agent as agent_mod

    orig = agent_mod.CaptionAgent.from_checkpoint

    def patched(ckpt_dir, **kw):
        import dataclasses

        return dataclasses.replace(orig(ckpt_dir, **kw),
                                   max_new_tokens=args.max_new_tokens)

    agent_mod.CaptionAgent.from_checkpoint = staticmethod(patched)

    from faithdiff_tpu.cli import main as cli_main

    print(f"[caption-full] running cli caption "
          f"({time.perf_counter()-t0:.0f}s)...", flush=True)
    cli_main(["caption", "--img_dir", img_dir, "--save_dir", out_dir,
              "--captioner_dir", cap_dir])
    with open(os.path.join(out_dir, "x.json")) as f:
        rec = json.load(f)
    assert "caption" in rec
    print(json.dumps({
        "event": "caption_cli_full_scale_executed",
        "caption_len": len(rec["caption"]),
        "wall_s": round(time.perf_counter() - t0, 1),
        "max_new_tokens": args.max_new_tokens,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
