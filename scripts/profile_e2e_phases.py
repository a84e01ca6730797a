"""Per-phase wall-time breakdown of a large-image restore on the real chip.

Round-2 weak #2: ~39% of the 8K wall (and a similar share at 4K) is
non-UNet — tiled denoise-encoder, VAE encode/decode, host dispatch,
postprocess — and none of it had a measured breakdown. This wraps the
pipeline's phase entry points with sync'd timers and prints one JSON line.

Usage: python scripts/profile_e2e_phases.py [size] [--steps N] [--overlap F]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("size", nargs="?", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--overlap", type=float, default=None)
    ap.add_argument("--use_fp8", action="store_true")
    ap.add_argument("--chunk", type=int, default=None,
                    help="override tile_chunk (default: 2 at >=4K else 4)")
    args = ap.parse_args()

    from faithdiff_tpu.config import PipelineConfig
    from faithdiff_tpu.pipelines.factory import build_pipeline
    from faithdiff_tpu.utils.profiling import device_sync

    size = args.size
    kw = {} if args.overlap is None else {"tile_overlap": args.overlap}
    pipe = build_pipeline(
        pipeline_config=PipelineConfig(
            num_inference_steps=args.steps,
            use_tiled_vae=size >= 4096, **kw),
        dtype=jnp.bfloat16,
        tile_chunk=args.chunk or (2 if size >= 4096 else 4),
        use_fp8=args.use_fp8,
    )

    phases = {}

    def timed(name, fn):
        def wrapper(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            leaf = (out if isinstance(out, jax.Array)
                    else jax.tree.leaves(out)[0])
            if isinstance(leaf, jax.core.Tracer):
                # called from inside another (jitted) phase — e.g.
                # vae_decode inside _jit_postprocess; the outer timer owns it
                return out
            device_sync(leaf)
            phases[name] = phases.get(name, 0.0) + time.perf_counter() - t0
            return out
        return wrapper

    pipe.denoise_encoder_apply = timed("denoise_encoder",
                                       pipe.denoise_encoder_apply)
    pipe.vae_encode = timed("vae_encode", pipe.vae_encode)
    pipe.vae_decode = timed("vae_decode", pipe.vae_decode)
    pipe._jit_denoise = timed("denoise", pipe._jit_denoise)
    pipe._jit_denorm = timed("denorm", pipe._jit_denorm)
    pipe._jit_postprocess = timed("postprocess", pipe._jit_postprocess)
    # decompose the round-4 "other" tail: input upload+normalize and the
    # streaming color fix (host-assembled readback) were untimed
    pipe._jit_prep = timed("input_upload_prep", pipe._jit_prep)
    import faithdiff_tpu.utils.color_fix as _cfx

    _orig_scf = _cfx.streaming_color_fix

    def _timed_scf(*a, **k):
        t0 = time.perf_counter()
        out = _orig_scf(*a, **k)
        phases["color_fix_stream"] = (phases.get("color_fix_stream", 0.0)
                                      + time.perf_counter() - t0)
        return out

    _cfx.streaming_color_fix = _timed_scf

    pe = jnp.zeros((1, 77, 2048), jnp.float32)
    pooled = jnp.zeros((1, 1280), jnp.float32)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)

    # compile pass
    t0 = time.perf_counter()
    out = pipe(img, pe, pooled, seed=0, output_type="uint8")
    compile_s = time.perf_counter() - t0
    phases.clear()

    t0 = time.perf_counter()
    out = pipe(img, pe, pooled, seed=1, output_type="uint8")
    total = time.perf_counter() - t0

    accounted = sum(phases.values())
    print(json.dumps({
        "metric": f"e2e_phase_breakdown_{size}_{args.steps}steps"
                  + ("_fp8" if args.use_fp8 else "")
                  + (f"_chunk{args.chunk}" if args.chunk else ""),
        "value": round(total, 2), "unit": "s",
        "compile_s": round(compile_s, 1),
        "phases_s": {k: round(v, 2) for k, v in sorted(
            phases.items(), key=lambda kv: -kv[1])},
        "other_s": round(total - accounted, 2),
        "finite": bool(np.isfinite(out).all()),
    }), flush=True)


if __name__ == "__main__":
    main()
