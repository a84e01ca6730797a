"""Fused NF4 dequant-matmul Pallas kernel.

The round-3 finding (docs/PERFORMANCE.md "Captioner at scale"): the XLA
weight-only NF4 path (`utils/quantize.py:nf4_matmul`) re-materialises the
full dequantised weight in HBM every token — 13B decode measured 1.9 s per
token, unusable next to int8's 18.4 ms. The wall is not the 4-bit HBM
traffic (6.6 GB/token ~= 8 ms at 819 GB/s) but the decoded bf16 weight
round-trip XLA inserts.

This kernel streams the PACKED codes HBM -> VMEM, unpacks + LUT-decodes +
absmax-scales in VMEM registers, and feeds the MXU directly — the decoded
weight never exists outside VMEM. Reference capability: bitsandbytes
`load_4bit` 4-bit inference (`/root/reference/llava/model/builder.py:29-38`),
whose CUDA kernels do exactly this (dequantize into the GEMM prologue).

Layout contract (NF4_PACK_HALFROW, `utils/quantize.py`): viewed as
`packed.reshape(out, in//2)`, byte (o, c) holds element (o, c) of the
[out, in] weight in its HIGH nibble and element (o, c + in/2) in the LOW.
The activation split is then two FREE slices (x[:, :in/2], x[:, in/2:]) —
the previous half-block layout needed a 32-element-granular lane permute
of x that measured 1.26 ms on a [1, 13824] vector, dominating the kernel.
Absmax blocks remain 64 consecutive row elements (bitsandbytes semantics),
independent of the byte layout; the per-element scale is rebuilt in-kernel
as a tiny MXU matmul against an iota-built 0/1 expansion matrix (a 3D
broadcast+reshape is an unsupported Mosaic shape cast, and the per-tile
[to, ti/64] absmax slice has a sub-128 lane dim Mosaic also refuses).

    y = x_hi @ (decode(hi) * s_hi).T + x_lo @ (decode(lo) * s_lo).T
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.quantize import NF4_CODE, NF4_PACK_HALFROW, NF4Weight

BLOCK = 64          # nf4 quantization block (elements per absmax)


def _lut16(idx_i32: jax.Array) -> jax.Array:
    """16-entry NF4 LUT as a binary select tree over the nibble's bits:
    15 vector selects + 4 bit tests. EXACT (each leaf is the table
    constant) and measured 1.7x faster than the 16-way compare+FMA
    select-sum on v5e (86 vs 50 G el/s at the 13B decode shape) — a gather
    is ~14x slower still (~6 G el/s)."""
    c = [np.float32(v) for v in NF4_CODE]
    b0 = (idx_i32 & 1) == 1
    b1 = (idx_i32 & 2) == 2
    b2 = (idx_i32 & 4) == 4
    b3 = (idx_i32 & 8) == 8
    l0 = [jnp.where(b0, c[2 * i + 1], c[2 * i]) for i in range(8)]
    l1 = [jnp.where(b1, l0[2 * i + 1], l0[2 * i]) for i in range(4)]
    l2 = [jnp.where(b2, l1[2 * i + 1], l1[2 * i]) for i in range(2)]
    return jnp.where(b3, l2[1], l2[0])


def _expand_absmax(s, base, half_ti):
    """Per-block absmax rows -> per-element scales for one tile, as
    s @ E with E[k, c] = (k == (base + c) // BLOCK) built from 2D iotas —
    one tiny MXU matmul doing block selection + expansion together."""
    nb_all = s.shape[1]
    blk_row = jax.lax.broadcasted_iota(jnp.int32, (nb_all, half_ti), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nb_all, half_ti), 1)
    expand = (blk_row == (base + col) // BLOCK).astype(jnp.float32)
    return jnp.dot(s, expand, preferred_element_type=jnp.float32)


def _nf4_matvec_kernel(xh_ref, xl_ref, p_ref, s_ref, o_ref, acc_ref, *,
                       in_f, n_in_tiles, precision):
    """One (out_tile, in_tile) program.

    xh/xl: [B, ti/2]      — activation slices x[:, j*ti/2:...] and
                            x[:, in/2 + j*ti/2:...] (free slices of x)
    p:     [to, ti/2] u8  — packed codes
    s:     [to, in/64] f32 — per-block absmax, FULL rows (<=216 f32/row)
    acc:   [B, to] f32 VMEM scratch, accumulated over the in-tile grid dim
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int32 nibble extraction: Mosaic has no i8 vector shifts (arith.shrui
    # on vector<...xi8> fails to lower); the upcast lives only in VMEM
    p = p_ref[:].astype(jnp.int32)
    to, half_ti = p.shape
    s = s_ref[:]
    s_hi = _expand_absmax(s, j * half_ti, half_ti)
    s_lo = _expand_absmax(s, in_f // 2 + j * half_ti, half_ti)
    # decoded weights go to the MXU in the activation dtype — bf16 in
    # production, matching the XLA fallback's dequant-to-compute_dtype; f32
    # runs request HIGHEST precision (the MXU's default f32 emulation has
    # ~1% error at these shapes)
    xd = xh_ref.dtype
    w_hi = (_lut16(p >> 4) * s_hi).astype(xd)          # [to, ti/2]
    w_lo = (_lut16(p & 0xF) * s_lo).astype(xd)
    acc_ref[:] += (
        jax.lax.dot_general(xh_ref[:], w_hi, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)
        + jax.lax.dot_general(xl_ref[:], w_lo, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=precision))

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pick_tile(n: int, target: int, step: int) -> int:
    """Largest multiple of `step` that divides n and is <= target (0 if
    none)."""
    t = (min(target, n) // step) * step
    while t >= step:
        if n % t == 0:
            return t
        t -= step
    return 0


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _nf4_matmul_fused_2d(x2d, packed_oi, absmax_oi, out_dtype=jnp.bfloat16,
                         interpret=False):
    b, in_f = x2d.shape
    out_f = packed_oi.shape[0]
    # in-tile: lane dim of the packed block is ti/2 -> multiple of 256;
    # out-tile: sublane dim of a u8 block -> multiple of 32. Targets from a
    # measured sweep at the 13B shapes (ti 1280-2560 / to 512-768 all land
    # ~85 G el/s; smaller out-tiles pay per-program overhead, bigger ones
    # VMEM pressure)
    ti = _pick_tile(in_f, 2048, 256)
    to = _pick_tile(out_f, 768, 32)
    assert ti and to, (in_f, out_f)
    n_in_tiles = in_f // ti

    compute = jnp.float32 if out_dtype == jnp.float32 else jnp.bfloat16
    precision = (jax.lax.Precision.HIGHEST if compute == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    x2d = x2d.astype(compute)
    grid = (out_f // to, n_in_tiles)
    nit = n_in_tiles
    return pl.pallas_call(
        functools.partial(_nf4_matvec_kernel, in_f=in_f,
                          n_in_tiles=n_in_tiles, precision=precision),
        grid=grid,
        in_specs=[
            # x passed twice: block j of the first operand is the hi slice
            # x[:, j*ti/2 : ...]; of the second the lo slice at in/2 offset
            # (block index shifted by n_in_tiles)
            pl.BlockSpec((b, ti // 2), lambda i, j: (0, j)),
            pl.BlockSpec((b, ti // 2), lambda i, j, nit=nit: (0, nit + j)),
            pl.BlockSpec((to, ti // 2), lambda i, j: (i, j)),
            pl.BlockSpec((to, in_f // BLOCK), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((b, to), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, out_f), out_dtype),
        scratch_shapes=[pltpu.VMEM((b, to), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # out tiles are independent; in tiles accumulate sequentially
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x2d, x2d, packed_oi, absmax_oi)


def nf4_fusable(q: NF4Weight, batch: int) -> bool:
    """The kernel covers every quantised 13B LLaMA shape (5120/13824
    matrices); refuse odd shapes and huge batches (VMEM: the x slices +
    accumulator are resident per program)."""
    in_f, out_f = q.shape
    return (int(q.pack_format) == NF4_PACK_HALFROW
            and in_f % 512 == 0
            and _pick_tile(in_f, 2048, 256) > 0
            and _pick_tile(out_f, 512, 32) > 0
            and batch <= 1024)


def nf4_matmul_fused(x: jax.Array, q: NF4Weight, compute_dtype=jnp.bfloat16,
                     interpret: bool = False) -> jax.Array:
    """y = x @ dequant(q), decoded in VMEM. x: [..., in] -> [..., out]."""
    in_f, out_f = q.shape
    lead = x.shape[:-1]
    x2d = x.reshape(-1, in_f)
    y = _nf4_matmul_fused_2d(x2d, q.packed, q.absmax.astype(jnp.float32),
                             out_dtype=compute_dtype, interpret=interpret)
    return y.reshape(*lead, out_f)
