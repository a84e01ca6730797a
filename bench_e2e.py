"""End-to-end restoration benchmark on one TPU chip (full SDXL config,
random weights — measures compute, not quality).

Scenarios:
  1024: 512x512 LR x2 -> 1024^2 output, single 128^2-latent tile, 20 steps
  2048: 1024x1024 LR x2 -> 2048^2 output, 9 tiles, 20 steps

Prints one JSON line per scenario. Not the driver bench (see bench.py).
"""
from __future__ import annotations

import json
import sys
import time

import jax

# persistent compile cache: SDXL-scale jits take ~10 min through the
# device tunnel; keep it INSIDE the repo so round-boundary /tmp wipes do
# not evict it (gitignored)
import os as _os

jax.config.update(
    "jax_compilation_cache_dir",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np


def caption_phase(image: np.ndarray) -> float:
    """13B-int8 caption pass (random weights — compute character): init the
    LLaVA-scale agent stack, caption the LR image, then FREE it so the
    restore pipeline can use the chip. Mirrors the reference's sequential
    `test.py` flow: LLaVA captions, GPU GC, FaithDiff restores
    (`/root/reference/test.py:104-160`). Returns caption wall seconds
    (excluding the one-time init/compile)."""
    import gc
    import time

    from faithdiff_tpu.captioner.clip_vision import (CLIPVisionConfig,
                                                     CLIPVisionTower,
                                                     VisionProjector)
    from faithdiff_tpu.captioner.llama import (LlamaConfig, LlamaForCausalLM,
                                               greedy_generate)

    cfg = __import__("dataclasses").replace(LlamaConfig.llava_13b(),
                                            quant="int8")
    model = LlamaForCausalLM(cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32),
        method=LlamaForCausalLM.init_forward))(jax.random.PRNGKey(0))
    from faithdiff_tpu.captioner.clip_vision import preprocess_clip_image

    vcfg = CLIPVisionConfig()
    vision = CLIPVisionTower(vcfg, dtype=jnp.bfloat16)
    proj = VisionProjector(cfg.hidden_size, dtype=jnp.bfloat16)
    pix = jnp.asarray(preprocess_clip_image(
        np.uint8(np.clip(image, 0, 1) * 255), vcfg.image_size))
    vp = jax.jit(vision.init)(jax.random.PRNGKey(1), pix)
    pp = jax.jit(proj.init)(jax.random.PRNGKey(2), vision.apply(vp, pix))

    def run(seed):
        feats = vision.apply(vp, pix)
        emb = proj.apply(pp, feats).astype(jnp.bfloat16)
        # vicuna text prompt around the image tokens (~74 tokens)
        text = jnp.zeros((1, 74, cfg.hidden_size), jnp.bfloat16)
        r = greedy_generate(model, params, jnp.concatenate([text, emb], 1),
                            max_new_tokens=77, temperature=0.0,
                            key=jax.random.PRNGKey(seed))
        return int(jnp.sum(r.lengths))

    run(0)                                   # compile
    t0 = time.perf_counter()
    run(1)
    caption_s = time.perf_counter() - t0
    del params, vp, pp
    gc.collect()
    return caption_s


def main(scenarios=("1024",), overlap=None, steps=20, use_fp8=False,
         with_caption=False, resume_dir=None):
    """`overlap`/`steps` override the reference defaults (0.5 / 20) — the
    documented "fast mode" trade-off is overlap 0.75 (stride 96: fewer
    tiles) + 10 steps; overlap 0.25 is the max-quality direction (more
    tiles — see the round-3 overlap-semantics correction in
    docs/PERFORMANCE.md).
    `use_fp8` measures the min-HBM weight-storage mode. `with_caption`
    prepends a 13B-int8 caption pass (the reference's primary entry runs
    LLaVA before every restore, `test.py:108`)."""
    from faithdiff_tpu.config import PipelineConfig
    from faithdiff_tpu.pipelines.factory import build_pipeline
    from faithdiff_tpu.utils.profiling import device_sync

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    caption_s = None
    if with_caption:
        rng0 = np.random.default_rng(7)
        caption_s = caption_phase(
            rng0.random((512, 512, 3)).astype(np.float32))

    pe = jnp.zeros((1, 77, 2048), jnp.float32)
    pooled = jnp.zeros((1, 1280), jnp.float32)

    pipe = None
    for scen in scenarios:
        size = int(scen)
        # free the previous pipeline's 5.2 GB of bf16 params BEFORE building
        # the next one — two live pipelines exceed one chip's HBM
        if pipe is not None:
            del pipe
            import gc

            gc.collect()
        kw = {} if overlap is None else {"tile_overlap": overlap}
        pipe = build_pipeline(
            pipeline_config=PipelineConfig(
                num_inference_steps=steps,
                # 4K-class and above: tiled VAE/denoise-encoder (memory)
                use_tiled_vae=size >= 4096,
                **kw,
            ),
            dtype=dtype,
            # chunk 4 measured faster than 2 at 4K (143.6 vs 152.8 s: fewer
            # lax.map iterations, better MXU batching) and fits thanks to
            # lazy per-chunk tile slicing
            tile_chunk=4,
            # split any step whose chunk loop exceeds ~48 iterations into
            # multiple dispatches (tunnel kills ~60 s dispatches; 48 iters
            # x ~0.5 s ~= 24 s). Only kicks in at extreme tile counts
            # (8K overlap 0.25 = 211 iterations).
            max_chunks_per_dispatch=48,
            use_fp8=use_fp8,
        )
        rng = np.random.default_rng(0)
        img = rng.random((size, size, 3)).astype(np.float32)

        # `resume_dir` enables per-step canvas checkpointing on the
        # host-driven path: a tunnel kernel fault mid-8K-run resumes at the
        # next step on re-invocation instead of restarting (the measured
        # run then reports completed-wall-time across attempts)
        ck = dict(checkpoint_dir=resume_dir) if resume_dir else {}
        t0 = time.perf_counter()
        out = pipe(img, pe, pooled, seed=0, output_type="uint8", **ck)
        compile_s = time.perf_counter() - t0

        ck2 = (dict(checkpoint_dir=resume_dir + "_timed")
               if resume_dir else {})
        t0 = time.perf_counter()
        out = pipe(img, pe, pooled, seed=1, output_type="uint8", **ck2)
        run_s = time.perf_counter() - t0

        tag = f"{size}_{steps}steps" + (
            "" if overlap is None else f"_ov{overlap}") + (
            "_fp8" if use_fp8 else "")
        rec = {
            "metric": f"e2e_restore_{tag}",
            "value": round(run_s, 2),
            "unit": "s",
            "images_per_min": round(60.0 / run_s, 2),
            "compile_s": round(compile_s, 1),
            "finite": bool(np.isfinite(out).all()),
        }
        if caption_s is not None:
            rec["caption_s"] = round(caption_s, 2)
            rec["caption_plus_restore_s"] = round(caption_s + run_s, 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("scenarios", nargs="*", default=["1024"])
    ap.add_argument("--overlap", type=float, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--use_fp8", action="store_true")
    ap.add_argument("--with_caption", action="store_true")
    ap.add_argument("--resume_dir", default=None)
    a = ap.parse_args()
    main(tuple(a.scenarios), overlap=a.overlap, steps=a.steps,
         use_fp8=a.use_fp8, with_caption=a.with_caption,
         resume_dir=a.resume_dir)
