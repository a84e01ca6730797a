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
# device tunnel; cache them across processes/rounds
jax.config.update("jax_compilation_cache_dir", "/tmp/faithdiff_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np


def main(scenarios=("1024",), overlap=None, steps=20, use_fp8=False):
    """`overlap`/`steps` override the reference defaults (0.5 / 20) — the
    documented "fast mode" trade-off is overlap 0.25 + 10 steps.
    `use_fp8` measures the min-HBM weight-storage mode."""
    from faithdiff_tpu.config import PipelineConfig
    from faithdiff_tpu.pipelines.factory import build_pipeline
    from faithdiff_tpu.utils.profiling import device_sync

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

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
            tile_chunk=2 if size >= 4096 else 4,
            use_fp8=use_fp8,
        )
        rng = np.random.default_rng(0)
        img = rng.random((size, size, 3)).astype(np.float32)

        t0 = time.perf_counter()
        out = pipe(img, pe, pooled, seed=0, output_type="uint8")
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = pipe(img, pe, pooled, seed=1, output_type="uint8")
        run_s = time.perf_counter() - t0

        tag = f"{size}_{steps}steps" + (
            "" if overlap is None else f"_ov{overlap}") + (
            "_fp8" if use_fp8 else "")
        print(json.dumps({
            "metric": f"e2e_restore_{tag}",
            "value": round(run_s, 2),
            "unit": "s",
            "images_per_min": round(60.0 / run_s, 2),
            "compile_s": round(compile_s, 1),
            "finite": bool(np.isfinite(out).all()),
        }), flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("scenarios", nargs="*", default=["1024"])
    ap.add_argument("--overlap", type=float, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--use_fp8", action="store_true")
    a = ap.parse_args()
    main(tuple(a.scenarios), overlap=a.overlap, steps=a.steps,
         use_fp8=a.use_fp8)
