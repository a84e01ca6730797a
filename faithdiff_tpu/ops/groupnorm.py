"""Fused GroupNorm Pallas kernels.

Round-2 profiling (`scripts/profile_unet.py`) showed XLA lowering the
GroupNorm statistics as (f32, f32) tuple fusions that materialise
full-resolution fp32 partials — ~25 ms/step of norm/elementwise time in the
SDXL UNet against a ~10 ms HBM roofline. This module lowers GroupNorm as
two Pallas passes with exact minimal traffic and no XLA ops in between:

1. stats kernel: per-channel sum / sum-of-squares accumulated in fp32 VMEM
   scratch (one read of x); on the final block the group fold runs
   in-kernel and emits the per-channel effective scale/bias directly
2. apply kernel: out = x * eff_scale + eff_bias with the optional SiLU
   epilogue folded in (one read + one write)

Measured vs the XLA lowering at the SDXL hot shape [2, 128, 128, 320]
(bf16, with SiLU): 240 -> see PERFORMANCE.md. Small-spatial shapes stay on
XLA where kernel fixed costs dominate.

Backward runs through the plain-XLA reference implementation via
`jax.custom_vjp` (same pattern as `ops/attention.py`).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, *refs, num_groups, epsilon, n, has_add):
    """Grid (B, n_blocks); accumulates channel sums in scratch, emits
    effective scale/bias [1, 1, C] on the last block.

    `has_add` folds a per-(batch, channel) additive term (the ResNet
    time-embedding injection) into the normalised tensor WITHOUT ever
    materialising x+add in HBM — the round-3 verdict's fusion-spanning
    requirement: the pallas_call must not leave an XLA elementwise op
    stranded at its boundary."""
    if has_add:
        add_ref, scale_ref, bias_ref, es_ref, eb_ref, s1_ref, s2_ref = refs
    else:
        scale_ref, bias_ref, es_ref, eb_ref, s1_ref, s2_ref = refs
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    x = x_ref[0].astype(jnp.float32)            # [rows, W, C]
    if has_add:
        x = x + add_ref[0, 0][None, None]
    s1 = jnp.sum(x, axis=(0, 1))                # [C]
    s2 = jnp.sum(jnp.square(x), axis=(0, 1))

    @pl.when(i == 0)
    def _init():
        s1_ref[...] = s1
        s2_ref[...] = s2

    @pl.when(i > 0)
    def _acc():
        s1_ref[...] += s1
        s2_ref[...] += s2

    @pl.when(i == nb - 1)
    def _fold():
        c = x.shape[-1]
        g = num_groups
        # Mosaic cannot reshape [C] -> [G, C/G] (lane dim C/G < 128), so the
        # channel->group fold runs as tiny one-hot matmuls instead
        row_g = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // (c // g)
        col_g = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
        m = (row_g == col_g).astype(jnp.float32)                 # [C, G]
        s1v = s1_ref[...][None]                                  # [1, C]
        s2v = s2_ref[...][None]
        gs1 = jax.lax.dot_general(s1v, m, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        gs2 = jax.lax.dot_general(s2v, m, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mean = gs1 / n                                           # [1, G]
        var = jnp.maximum(gs2 / n - jnp.square(mean), 0.0)
        rstd = jax.lax.rsqrt(var + epsilon)
        # broadcast per-group values back to channels: [1, G] @ M^T -> [1, C]
        mean_c = jax.lax.dot_general(mean, m, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        rstd_c = jax.lax.dot_general(rstd, m, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        es = rstd_c[0] * scale_ref[0, 0]
        es_ref[0, 0] = es
        eb_ref[0, 0] = bias_ref[0, 0] - mean_c[0] * es


def _apply_kernel(x_ref, *refs, act, has_add):
    if has_add:
        add_ref, es_ref, eb_ref, o_ref = refs
    else:
        es_ref, eb_ref, o_ref = refs
    x = x_ref[0].astype(jnp.float32)
    if has_add:
        x = x + add_ref[0, 0][None, None]
    y = x * es_ref[0, 0][None, None] + eb_ref[0, 0][None, None]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_rows(h: int, w: int, c: int, budget: int = 1 << 21) -> int:
    """Largest divisor of h whose [rows, w, c] bf16 block stays under the
    VMEM budget (~2 MB; in+out blocks double-buffered must fit 16 MB)."""
    rows = max(1, min(h, budget // max(2 * w * c, 1)))
    while h % rows:
        rows -= 1
    return rows


@functools.partial(jax.jit, static_argnames=("num_groups", "epsilon", "act",
                                             "interpret"))
def _fused_group_norm_fwd(x, scale, bias, add, num_groups, epsilon, act,
                          interpret=False):
    b, h, w, c = x.shape
    g = num_groups
    rows = _pick_rows(h, w, c)
    grid = (b, h // rows)
    n = float(h * w * (c // g))
    scale3 = scale.astype(jnp.float32).reshape(1, 1, c)
    bias3 = bias.astype(jnp.float32).reshape(1, 1, c)
    has_add = add is not None
    add_ops, add_spec = (), ()
    if has_add:
        add_ops = (add.astype(jnp.float32).reshape(b, 1, c),)
        add_spec = (pl.BlockSpec((1, 1, c), lambda b, i: (b, 0, 0)),)

    es, eb = pl.pallas_call(
        functools.partial(_stats_kernel, num_groups=g, epsilon=epsilon, n=n,
                          has_add=has_add),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, w, c), lambda b, i: (b, i, 0, 0)),
            *add_spec,
            pl.BlockSpec((1, 1, c), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, i: (0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, c), lambda b, i: (b, 0, 0)),
                   pl.BlockSpec((1, 1, c), lambda b, i: (b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((c,), jnp.float32),
                        pltpu.VMEM((c,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, *add_ops, scale3, bias3)

    return pl.pallas_call(
        functools.partial(_apply_kernel, act=act, has_add=has_add),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, w, c), lambda b, i: (b, i, 0, 0)),
            *add_spec,
            pl.BlockSpec((1, 1, c), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, w, c), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, *add_ops, es, eb)


def group_norm_reference(x, scale, bias, num_groups: int, epsilon: float,
                         act: Optional[str] = None, add=None):
    """Plain-XLA GroupNorm (fp32 stats) + optional SiLU — the CPU path and
    the backward rule. `add` is a per-(batch, channel) additive term folded
    in before the statistics (the ResNet time-embedding injection)."""
    b, c = x.shape[0], x.shape[-1]
    g = num_groups
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= x.shape[a]
    x32 = x.astype(jnp.float32)
    if add is not None:
        shape = (b,) + (1,) * len(spatial_axes) + (c,)
        x32 = x32 + add.astype(jnp.float32).reshape(shape)
    s1 = jnp.sum(x32, axis=spatial_axes)
    s2 = jnp.sum(jnp.square(x32), axis=spatial_axes)
    n = n_spatial * (c // g)
    gs1 = jnp.sum(s1.reshape(b, g, c // g), axis=-1)
    gs2 = jnp.sum(s2.reshape(b, g, c // g), axis=-1)
    mean = gs1 / n
    var = jnp.maximum(gs2 / n - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + epsilon)
    mean_c = jnp.repeat(mean, c // g, axis=-1)
    rstd_c = jnp.repeat(rstd, c // g, axis=-1)
    eff_scale = rstd_c * scale[None, :]
    eff_bias = bias[None, :] - mean_c * eff_scale
    shape = (b,) + (1,) * len(spatial_axes) + (c,)
    y = x32 * eff_scale.reshape(shape) + eff_bias.reshape(shape)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_group_norm(x, scale, bias, add, num_groups, epsilon, act):
    return _fused_group_norm_fwd(x, scale, bias, add, num_groups, epsilon,
                                 act)


def _fgn_fwd(x, scale, bias, add, num_groups, epsilon, act):
    return fused_group_norm(x, scale, bias, add, num_groups, epsilon,
                            act), (x, scale, bias, add)


def _fgn_bwd(num_groups, epsilon, act, res, grad):
    x, scale, bias, add = res
    if add is None:
        _, vjp = jax.vjp(
            lambda x, s, b: group_norm_reference(x, s, b, num_groups,
                                                 epsilon, act),
            x, scale, bias)
        return vjp(grad) + (None,)
    _, vjp = jax.vjp(
        lambda x, s, b, a: group_norm_reference(x, s, b, num_groups, epsilon,
                                                act, a), x, scale, bias, add)
    return vjp(grad)


fused_group_norm.defvjp(_fgn_fwd, _fgn_bwd)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


import os as _os

# round-4 fusion-spanning experiment switch: the Pallas path now absorbs
# the neighbouring elementwise work (SiLU epilogue AND the time-embedding
# `add` prologue), so re-measure the full step with it on
# (FAITHDIFF_PALLAS_GN=1) vs the XLA default. Round-2's regression
# (126.9 -> 139.6 ms) came from a BARE GroupNorm kernel stranding those
# fusions at its boundary.
_PALLAS_DEFAULT = _os.environ.get("FAITHDIFF_PALLAS_GN", "0") == "1"


def group_norm(x, scale, bias, num_groups: int = 32, epsilon: float = 1e-5,
               act: Optional[str] = None, add=None,
               use_pallas: Optional[bool] = None):
    """GroupNorm (+fused SiLU epilogue, +fused per-(batch,channel) `add`
    prologue), XLA by default.

    Round-2 finding: the bare Pallas kernels win in isolation at large
    spatial sizes (236 vs 385 us at [2, 128, 128, 320] standalone) but
    REGRESSED the full SDXL UNet step (126.9 -> 139.6 ms measured) — the
    pallas_call is an opaque fusion boundary, so XLA lost the
    producer/consumer elementwise fusions around every norm. Round 4 moves
    those neighbours INSIDE the kernel (`act` epilogue + `add` prologue, the
    ResNet time-embedding injection) — measured results in
    docs/PERFORMANCE.md; enable with FAITHDIFF_PALLAS_GN=1.
    """
    if use_pallas is None:
        use_pallas = _PALLAS_DEFAULT and x.ndim == 4 and _on_tpu()
    if use_pallas:
        return fused_group_norm(x, scale, bias, add, num_groups, epsilon,
                                act)
    return group_norm_reference(x, scale, bias, num_groups, epsilon, act,
                                add)
