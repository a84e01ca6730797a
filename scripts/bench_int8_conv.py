"""Measure int8 vs bf16 convolution at the UNet's hot shapes on one v5e.

The round-2 step-floor analysis (docs/PERFORMANCE.md) puts convs at 71 ms
= 92% of bf16 MXU peak; the only lever below that is the v5e's 2x int8
MXU rate. This script answers the prerequisite question: does XLA lower
`conv_general_dilated(int8, int8, preferred_element_type=int32)` onto the
fast MXU path at SDXL shapes, and what end-to-end speedup does the
quantize -> conv -> dequantize sequence give vs plain bf16?

Hot shapes (from the profiled CFG-pair step at 128x128 latents):
  [2, 128, 128, 320]  x 3x3x320->320   (down block 0)
  [2,  64,  64, 640]  x 3x3x640->640   (down block 1)
  [2,  32,  32, 1280] x 3x3x1280->1280 (down block 2 / mid)

Usage: python scripts/bench_int8_conv.py [--iters 30]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax.numpy as jnp
import numpy as np

SHAPES = [
    ((2, 128, 128, 320), 320),
    ((2, 64, 64, 640), 640),
    ((2, 32, 32, 1280), 1280),
]
DN = ("NHWC", "HWIO", "NHWC")


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=DN,
        preferred_element_type=jnp.float32)


def conv_int8_static(xq, wq, xs, ws):
    """Pre-quantized weights AND activations: the pure MXU question."""
    y = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (xs * ws)


def conv_int8_dynamic(x, wq, ws):
    """Realistic inference path: dynamic per-tensor activation quant."""
    xs = jnp.max(jnp.abs(x)) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (xs * ws)


def timeit(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out))                       # tunnel sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    r = np.random.default_rng(0)
    for shape, cout in SHAPES:
        cin = shape[-1]
        x = jnp.asarray(r.standard_normal(shape), jnp.float32)
        w = jnp.asarray(r.standard_normal((3, 3, cin, cout)) * 0.02,
                        jnp.float32)
        ws = jnp.max(jnp.abs(w)) / 127.0
        wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        xs = jnp.max(jnp.abs(x)) / 127.0
        xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)

        flops = 2 * np.prod(shape[:3]) * 9 * cin * cout
        t_bf = timeit(jax.jit(conv_bf16), (x, w), args.iters)
        t_i8s = timeit(jax.jit(conv_int8_static), (xq, wq, xs, ws),
                       args.iters)
        t_i8d = timeit(jax.jit(conv_int8_dynamic), (x, wq, ws), args.iters)
        # numeric sanity: int8 path approximates bf16
        ref = np.asarray(conv_bf16(x, w), np.float32)
        got = np.asarray(conv_int8_dynamic(x, wq, ws), np.float32)
        rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
        print(f"{shape} -> {cout}: bf16 {t_bf:.2f} ms "
              f"({flops / t_bf / 1e9:.0f} TF/s) | int8-static {t_i8s:.2f} ms "
              f"({flops / t_i8s / 1e9:.0f} TOP/s) | int8-dynamic "
              f"{t_i8d:.2f} ms | rel-err {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
