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

Outage resilience: the TPU backend rides a tunnel that dies transiently
(round 3 lost its official sample to exactly that, rc=1). Before touching
the backend in-process we PROBE it in a subprocess with bounded backoff;
on persistent failure we emit the last-good measurement from
`bench_last_good.json` with an explicit `"stale": true` marker instead of
failing with rc=1.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
# persistent compile cache: SDXL-scale jits take ~10 min through the device
# tunnel; keep the cache INSIDE the repo so round-boundary /tmp wipes do not
# evict it (gitignored)
_CACHE_DIR = os.path.join(_HERE, ".jax_cache")
_LAST_GOOD = os.path.join(_HERE, "bench_last_good.json")

REFERENCE_MS = 200.0
V5E_PEAK_BF16 = 197e12  # TPU v5e bf16 peak FLOP/s


def _probe_backend(window_s: float, interval_s: float = 20.0) -> bool:
    """True once `jax.devices()` succeeds in a SUBPROCESS (a failed in-process
    backend init can leave poisoned plugin state; the probe keeps retries
    clean). Bounded by `window_s` seconds of backoff."""
    deadline = time.time() + window_s
    attempt = 0
    while True:
        attempt += 1
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=max(60.0, interval_s * 6))
        if r.returncode == 0:
            return True
        if time.time() >= deadline:
            tail = (r.stderr or b"").decode(errors="replace")[-400:]
            print(f"[bench] backend probe failed (attempt {attempt}): {tail}",
                  file=sys.stderr)
            return False
        time.sleep(interval_s)


def _emit_stale(reason: str) -> int:
    if os.path.exists(_LAST_GOOD):
        with open(_LAST_GOOD) as f:
            rec = json.load(f)
        rec["stale"] = True
        rec["stale_reason"] = reason
        print(json.dumps(rec))
        return 0
    print(json.dumps({
        "metric": "unet_ms_per_step_1024tile_bf16", "value": None,
        "unit": "ms", "vs_baseline": None, "stale": True,
        "stale_reason": reason + "; no last-good measurement recorded"}))
    return 1


def _measure() -> dict:
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    import numpy as np

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

    # XLA cost analysis of the compiled step -> the falsifiable numbers
    # (FLOPs, bytes, roofline); mirrors scripts/profile_unet.py
    flops = bytes_acc = 0.0
    try:
        compiled = step.lower(
            params, sample, t, ctx, pooled, time_ids, cond).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass

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

    rec = {
        "metric": metric,
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_MS / ms, 3) if on_tpu else 0.0,
        # the reference repo publishes NO numbers (BASELINE.md); this ratio
        # divides by an ASSUMED reference-class constant, not a measurement
        "baseline_source": (
            "assumed 200 ms reference-class constant for an SDXL CFG-pair "
            "step at 1024^2 on a 24GB consumer GPU; not a measured baseline"),
        "on_tpu": on_tpu,
    }
    if flops > 0:
        # the defensible, measured numbers: hardware utilisation against the
        # v5e bf16 peak (197 TF/s) and the HBM roofline (819 GB/s)
        tf_s = flops / (ms / 1e3)
        rec["tflops_per_s"] = round(tf_s / 1e12, 1)
        rec["mfu"] = round(tf_s / V5E_PEAK_BF16, 4)
        rec["hbm_roofline_ms"] = round(bytes_acc / 819e9 * 1e3, 1)
        rec["flops_per_step"] = flops
    return rec


def main() -> int:
    window = float(os.environ.get("BENCH_RETRY_WINDOW_S", "480"))
    if not _probe_backend(window):
        return _emit_stale("TPU backend unavailable after "
                           f"{window:.0f}s of probing with backoff")
    try:
        rec = _measure()
    except Exception as e:  # backend died between probe and measurement
        return _emit_stale(f"measurement failed: {type(e).__name__}: {e}")
    if rec.pop("on_tpu"):
        rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(_LAST_GOOD, "w") as f:
            json.dump(rec, f)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
