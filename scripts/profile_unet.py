"""Profile the flagship UNet step on the real TPU chip.

Produces (VERDICT round-1 item 3):
- XLA cost analysis of the compiled step (FLOPs, bytes) -> MFU
- measured ms/step (tunnel-safe readback sync)
- a jax.profiler device trace parsed into a per-op time table

Usage: python scripts/profile_unet.py [--latent 128] [--iters 50]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time

# repo root on sys.path WITHOUT using PYTHONPATH (a PYTHONPATH entry shadows
# the axon jax-plugin discovery and kills TPU init)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s per chip


def build_step(latent: int):
    from faithdiff_tpu.config import UNetConfig
    from faithdiff_tpu.models.unet import UNet2DConditionModel

    cfg = UNetConfig()
    dtype = jnp.bfloat16
    model = UNet2DConditionModel(config=cfg, dtype=dtype)
    b = 2
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.standard_normal((b, latent, latent, 4)), dtype)
    t = jnp.full((b,), 500.0, jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((b, 77, cfg.cross_attention_dim)) * 0.02, dtype)
    pooled = jnp.asarray(rng.standard_normal((b, 1280)) * 0.02, dtype)
    time_ids = jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]] * b, jnp.float32)
    cond = jnp.asarray(
        rng.standard_normal((b, latent, latent, cfg.condition_channels)) * 0.1,
        dtype)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), sample, t, ctx, pooled, time_ids, cond)
    params = jax.tree.map(lambda p: p.astype(dtype), params)

    def step(params, sample, t, ctx, pooled, time_ids, cond):
        return model.apply(params, sample, t, ctx, pooled, time_ids, cond,
                           fusion_group_size=2)

    args = (params, sample, t, ctx, pooled, time_ids, cond)
    return step, args


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def parse_xplane(trace_dir: str, top: int = 40):
    """Sum device-plane event durations by op name from an xplane trace."""
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2",
                "tensorboard_plugin_profile.protobuf.xplane_pb2"):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        print("xplane proto unavailable; skipping trace parse")
        return None
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane.pb produced; skipping trace parse")
        return None
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    per_op = collections.Counter()
    total_ps = 0
    # only the synchronous TensorCore op line — async copy windows overlap
    # compute and must not be summed as cost
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name.lstrip("%")] += ev.duration_ps
                total_ps += ev.duration_ps
    if not per_op:
        print("no 'XLA Ops' line found; planes:",
              [p.name for p in space.planes])
        return None
    print(f"\n== device trace: {total_ps / 1e9:.2f} ms TensorCore total "
          f"(across all traced iterations)")

    def bucket(name: str) -> str:
        n = name.lower()
        head = n.split(" = ")[0]
        if "flash_attention" in n:
            return "pallas-flash-attn"
        if "convolution" in n or ("fusion" in head and "[3,3," in n):
            return "conv(3x3)+fused"
        if "dot" in n or "einsum" in n:
            return "matmul+fused"
        if head.startswith(("copy", "transpose", "bitcast", "reshape",
                            "slice", "dynamic")):
            return "copy/transpose/slice"
        if "fusion" in head:
            return "fusion(elementwise/norm/softmax)"
        if "reduce" in head:
            return "reduce"
        return "other"

    by_bucket = collections.Counter()
    for name, ps in per_op.items():
        by_bucket[bucket(name)] += ps
    print("\n-- by bucket --")
    for name, ps in by_bucket.most_common():
        print(f"{ps / 1e9:9.2f} ms  {100 * ps / max(total_ps, 1):5.1f}%  {name}")
    print(f"\n-- top {top} ops --")
    for name, ps in per_op.most_common(top):
        print(f"{ps / 1e9:9.2f} ms  {100 * ps / max(total_ps, 1):5.1f}%  {name[:160]}")
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--trace", default="/tmp/faithdiff_prof")
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    assert jax.devices()[0].platform == "tpu", jax.devices()
    step, sargs = build_step(args.latent)

    jitted = jax.jit(step)
    lowered = jitted.lower(*sargs)
    compiled = lowered.compile()
    ca_list = compiled.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    transcendentals = ca.get("transcendentals", 0.0)
    print(f"cost_analysis: flops={flops / 1e12:.3f} TF  "
          f"bytes={bytes_acc / 1e9:.2f} GB  "
          f"transcendentals={transcendentals / 1e9:.3f} G")

    out = jitted(*sargs)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = jitted(*sargs)
    sync(out)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    tf_s = flops / (ms / 1e3)
    print(f"measured: {ms:.2f} ms/step  -> {tf_s / 1e12:.1f} TF/s  "
          f"MFU={100 * tf_s / V5E_PEAK_BF16:.1f}% of v5e bf16 peak")
    print(f"HBM roofline: {bytes_acc / 1e9:.2f} GB @ 819 GB/s = "
          f"{bytes_acc / 819e9 * 1e3:.1f} ms minimum")

    if not args.no_trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = jitted(*sargs)
            sync(out)
        parse_xplane(args.trace)


if __name__ == "__main__":
    main()
