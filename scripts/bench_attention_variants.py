"""Micro-benchmark of flash-attention kernel variants on the real chip.

Grid: {scale-fold + base-2 softmax} x block_q x block_k (block_k == kv_len
degenerates the online softmax into a single-pass kernel — no rescale ops).
Shapes are the SDXL UNet hot cases from the round-2 profile
(`docs/PERFORMANCE.md`): self-attn at 64-res and 32-res, CFG pair.

Usage: python scripts/bench_attention_variants.py
"""
from __future__ import annotations

import functools
import math
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634


def kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, base2):
    q = q_ref[0]
    block_q = q.shape[0]
    kv_len = k_ref.shape[1]
    num_kb = kv_len // block_k
    if base2:
        # fold softmax scale and the exp->exp2 conversion into q once
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
        exp = jnp.exp2
    else:
        exp = jnp.exp

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if not base2:
            s = s * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = exp(s - m_new)
        alpha = exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), MASK, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "bq", "bk", "base2"))
def run(q, k, v, scale, bq, bk, base2):
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    grid = (bh, q_len // bq)
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, block_k=bk, base2=base2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, kv_len, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, kv_len, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, q_len, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(q, k, v)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, iters=30):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    shapes = [(20, 4096, 64), (40, 1024, 64)]
    for bh, s, d in shapes:
        q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
        scale = 1.0 / math.sqrt(d)
        flops = 4 * bh * s * s * d
        # reference output for correctness
        ref = None
        print(f"== shape bh={bh} s={s} d={d}")
        for base2 in (False, True):
            for bq in (256, 512, 1024):
                for bk in (512, 1024, 2048, s):
                    if bq > s or bk > s:
                        continue
                    try:
                        out = run(q, k, v, scale, bq, bk, base2)
                        outf = np.asarray(out, np.float32)
                        if ref is None:
                            ref = outf
                        err = float(np.abs(outf - ref).max())
                        ms = bench(lambda: run(q, k, v, scale, bq, bk, base2))
                        print(f"base2={int(base2)} bq={bq:5d} bk={bk:5d}: "
                              f"{ms:7.2f} ms  {flops / ms / 1e9:6.1f} TF/s  "
                              f"maxerr={err:.2e}", flush=True)
                    except Exception as e:  # noqa: BLE001
                        print(f"base2={int(base2)} bq={bq:5d} bk={bk:5d}: "
                              f"FAILED {type(e).__name__}: {str(e)[:100]}",
                              flush=True)


if __name__ == "__main__":
    main()
