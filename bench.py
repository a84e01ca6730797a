"""Benchmark: FaithDiff-SDXL UNet step latency on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Headline metric: full SDXL UNet (FaithDiff fusion active) forward for one
denoise step of one 1024x1024-pixel tile (128x128 latents) with CFG batch 2,
bf16 — the hot op of the reference pipeline
(`/root/reference/FaithDiff/pipelines/pipeline_FaithDiff_tlc.py:1350`, run
at fp16 on CUDA there).

`vs_baseline`: ratio of the CUDA fp16 reference-class time to ours (>1 means
we are faster). The reference repo publishes no numbers (BASELINE.md); we
use 200 ms as the reference-class figure for an SDXL UNet CFG-pair step at
1024^2 on the 24GB consumer GPUs the reference targets (README.md:19).
"""
from __future__ import annotations

import json
import time

import jax

# persistent compile cache: SDXL-scale jits take ~10 min through the
# device tunnel; cache them across processes/rounds
jax.config.update("jax_compilation_cache_dir", "/tmp/faithdiff_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

REFERENCE_MS = 200.0


def main():
    on_tpu = jax.devices()[0].platform == "tpu"

    from faithdiff_tpu.config import UNetConfig, tiny_unet_config
    from faithdiff_tpu.models.unet import UNet2DConditionModel

    if on_tpu:
        cfg = UNetConfig()
        latent, pooled_dim, dtype = 128, 1280, jnp.bfloat16
        metric = "unet_ms_per_step_1024tile_bf16"
    else:  # CPU smoke fallback
        cfg = tiny_unet_config()
        latent, pooled_dim, dtype = 16, 64, jnp.float32
        metric = "unet_ms_per_step_tiny_cpu"

    model = UNet2DConditionModel(config=cfg, dtype=dtype)
    b = 2  # CFG pair for one tile
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.standard_normal((b, latent, latent, 4)), dtype)
    t = jnp.full((b,), 500.0, jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((b, 77, cfg.cross_attention_dim)) * 0.02, dtype)
    pooled = jnp.asarray(rng.standard_normal((b, pooled_dim)) * 0.02, dtype)
    time_ids = jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]] * b, jnp.float32)
    cond = jnp.asarray(
        rng.standard_normal((b, latent, latent, cfg.condition_channels)) * 0.1,
        dtype)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), sample, t, ctx, pooled, time_ids, cond)
    params = jax.tree.map(lambda p: p.astype(dtype), params)

    @jax.jit
    def step(params, sample, t, ctx, pooled, time_ids, cond):
        return model.apply(params, sample, t, ctx, pooled, time_ids, cond,
                           fusion_group_size=2)

    def sync(x):
        # NOTE: under the axon tunnel, block_until_ready() does not actually
        # block — force a device->host readback to synchronize
        return float(jnp.sum(x.astype(jnp.float32)))

    out = step(params, sample, t, ctx, pooled, time_ids, cond)
    sync(out)  # compile + warmup

    iters = 50 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(params, sample, t, ctx, pooled, time_ids, cond)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3

    print(json.dumps({
        "metric": metric,
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_MS / ms, 3) if on_tpu else 0.0,
        # the reference repo publishes NO numbers (BASELINE.md); this ratio
        # divides by an ASSUMED reference-class constant, not a measurement
        "baseline_source": (
            "assumed 200 ms reference-class constant for an SDXL CFG-pair "
            "step at 1024^2 on a 24GB consumer GPU; not a measured baseline"),
    }))


if __name__ == "__main__":
    main()
