"""Captioner at-scale benchmark on the real TPU chip.

The reference's primary entry runs a 13B LLaVA per image
(`/root/reference/test.py:108`, `llava/llm_agent.py:66-103`) — this
measures the JAX captioner at that scale with random weights (compute
character, not quality): HBM-resident quantized LLaMA-13B, prefill
latency for a vicuna-prompt + 576-image-token multimodal sequence, and
greedy decode tokens/s through the single-dispatch
`lax.while_loop` generate path.

Weights are initialized DIRECTLY ON DEVICE via jitted init (a 13 GB
int8 tree never exists on host). Quantized projections carry zero int8
values — timing is data-independent for the matmuls, and no token ever
equals eos, so decode runs the full token budget (stable timing).

Usage:
  python scripts/bench_captioner.py [--quant int8|nf4] [--batch 1]
        [--prompt_len 650] [--decode_tokens 64] [--vision]

Prints one JSON line per measurement.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root on sys.path WITHOUT using PYTHONPATH (a PYTHONPATH entry breaks
# the axon TPU plugin's backend discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np


def tree_bytes(tree) -> int:
    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree))


def sync(x):
    # block_until_ready is a no-op through the device tunnel; sync via a
    # scalar readback (utils/profiling.device_sync does the same)
    return float(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.int32
                         else x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int8", choices=["int8", "nf4", ""])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt_len", type=int, default=650,
                    help="multimodal prompt tokens (576 image + vicuna text)")
    ap.add_argument("--decode_tokens", type=int, default=64)
    ap.add_argument("--vision", action="store_true",
                    help="also time the CLIP-L/336 vision tower + projector")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (plumbing check, not a benchmark)")
    args = ap.parse_args()

    from faithdiff_tpu.captioner.llama import (LlamaConfig, LlamaForCausalLM,
                                               greedy_generate)

    base = LlamaConfig.tiny() if args.tiny else LlamaConfig.llava_13b()
    cfg = dataclasses_replace_quant(base, args.quant)
    model = LlamaForCausalLM(cfg, dtype=jnp.bfloat16)
    b, s, d = args.batch, args.prompt_len, cfg.hidden_size

    print(f"[bench_captioner] init 13B quant={args.quant!r} on device...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    init = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32),
        method=LlamaForCausalLM.init_forward))
    params = init(jax.random.PRNGKey(0))
    gib = tree_bytes(params) / 1024**3
    sync(jax.tree.leaves(params)[0])
    print(f"[bench_captioner] params resident: {gib:.2f} GiB "
          f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr, flush=True)
    print(json.dumps({"metric": f"captioner_13b_{args.quant}_param_gib",
                      "value": round(gib, 2), "unit": "GiB",
                      "hbm_per_chip_gib": 16.0}), flush=True)

    emb = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((b, s, d)) * 0.02,
        jnp.bfloat16))

    def run(n_new, seed=0):
        r = greedy_generate(model, params, emb, max_new_tokens=n_new,
                            temperature=0.0,
                            key=jax.random.PRNGKey(seed))
        return sync(r.tokens)

    # ---- prefill: max_new_tokens=1 never enters the decode loop ----------
    print("[bench_captioner] compiling prefill...", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    run(1)
    print(f"[bench_captioner] prefill compile {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(1, seed=i)
        times.append(time.perf_counter() - t0)
    prefill_ms = min(times) * 1e3
    print(json.dumps({
        "metric": f"captioner_13b_{args.quant}_prefill_ms",
        "value": round(prefill_ms, 1), "unit": "ms",
        "prompt_tokens": s, "batch": b,
        "note": "includes one jitted dispatch + scalar readback through "
                "the device tunnel"}), flush=True)

    # ---- decode: (t[1+N] - t[1]) / N ------------------------------------
    n = args.decode_tokens
    print(f"[bench_captioner] compiling decode ({n} tokens)...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    run(1 + n)
    print(f"[bench_captioner] decode compile {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(1 + n, seed=i)
        times.append(time.perf_counter() - t0)
    full_s = min(times)
    decode_s = full_s - prefill_ms / 1e3
    tok_s = b * n / decode_s
    print(json.dumps({
        "metric": f"captioner_13b_{args.quant}_decode_tok_s",
        "value": round(tok_s, 1), "unit": "tokens/s",
        "per_token_ms": round(1e3 * decode_s / n, 1),
        "decode_tokens": n, "batch": b,
        "e2e_caption_s_at_512_tokens": round(
            prefill_ms / 1e3 + 512 / (tok_s / b), 1)}), flush=True)

    if args.vision:
        from faithdiff_tpu.captioner.clip_vision import (CLIPVisionConfig,
                                                         CLIPVisionTower,
                                                         VisionProjector)

        vcfg = CLIPVisionConfig()          # CLIP-L/336, 576 patches
        vision = CLIPVisionTower(vcfg, dtype=jnp.bfloat16)
        proj = VisionProjector(cfg.hidden_size, dtype=jnp.bfloat16)
        pix = jnp.zeros((b, vcfg.image_size, vcfg.image_size, 3))
        vp = jax.jit(vision.init)(jax.random.PRNGKey(1), pix)
        feats = vision.apply(vp, pix)
        pp = jax.jit(proj.init)(jax.random.PRNGKey(2), feats)
        tower = jax.jit(lambda vp, pp, x: proj.apply(pp, vision.apply(vp, x)))
        sync(tower(vp, pp, pix))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(tower(vp, pp, pix))
            times.append(time.perf_counter() - t0)
        print(json.dumps({
            "metric": "captioner_vision_tower_ms",
            "value": round(min(times) * 1e3, 1), "unit": "ms",
            "image_size": vcfg.image_size, "tokens": feats.shape[1],
            "batch": b}), flush=True)


def dataclasses_replace_quant(cfg, quant):
    import dataclasses

    return dataclasses.replace(cfg, quant=quant)


if __name__ == "__main__":
    main()
