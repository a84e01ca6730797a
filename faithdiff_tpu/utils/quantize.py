"""Weight quantization.

Capability-equivalent to the reference FP8 path
(`/root/reference/utils/system.py:13-32`: cast UNet weights to
float8_e4m3fn, keeping LoRA layers / the denoise `Encoder` modules /
`encoder_hid_proj` at original dtype) and the bitsandbytes int8 captioner
path (`llava/model/builder.py:29-38`).

TPU-native: fp8 storage with bf16 compute (XLA upcasts at use), plus an
int8 per-channel absmax scheme for the 13B captioner's matmuls.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_params_fp8(
    params: Any,
    skip_path_substrings: Sequence[str] = ("denoise_encoder", "norm", "ln_",
                                           "scale", "bias"),
) -> Any:
    """Cast weight leaves to float8_e4m3fn, skipping paths whose joined name
    contains any of `skip_path_substrings` (mirrors the reference's
    exclusion of Encoder modules and norms — fp8 norms destroy quality)."""

    def convert(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if any(s in name for s in skip_path_substrings):
            return leaf
        if leaf.dtype in (jnp.float32, jnp.bfloat16, jnp.float16):
            return leaf.astype(jnp.float8_e4m3fn)
        return leaf

    return jax.tree_util.tree_map_with_path(convert, params)


def dequantize_params(params: Any, dtype=jnp.bfloat16) -> Any:
    def convert(leaf):
        if leaf.dtype == jnp.float8_e4m3fn:
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(convert, params)


def param_bytes(params: Any) -> int:
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(params))


class Int8Weight(NamedTuple):
    """Per-output-channel absmax int8 quantised matrix."""

    values: jax.Array   # int8 [in, out]
    scales: jax.Array   # f32 [out]


def quantize_int8(w: jax.Array) -> Int8Weight:
    """[in, out] float -> int8 with per-column absmax scales (the
    weight-only analog of bitsandbytes' int8 scheme)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scales = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), -127, 127)
    return Int8Weight(values=q.astype(jnp.int8), scales=scales)


def int8_matmul(x: jax.Array, w: Int8Weight,
                compute_dtype=jnp.bfloat16) -> jax.Array:
    """x [., in] @ int8 weights, dequantised into the matmul epilogue."""
    y = jnp.dot(x.astype(compute_dtype),
                w.values.astype(compute_dtype),
                preferred_element_type=jnp.float32)
    return (y * w.scales).astype(compute_dtype)


# ---------------------------------------------------------------------------
# nf4 4-bit blockwise quantization (bitsandbytes NormalFloat4 semantics,
# the reference's `load_4bit` captioner path, `llava/model/builder.py:29-38`)
# ---------------------------------------------------------------------------

# the 16 NF4 levels: quantiles of N(0, 1) normalised to [-1, 1]
# (Dettmers et al., "QLoRA", Table A.1 / bitsandbytes functional.py).
# numpy, NOT jnp: a module-level jnp constant becomes an escaped tracer if
# this module is first imported inside a jit trace (lazy import in
# NF4Dense.__call__)
NF4_CODE = np.asarray([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], jnp.float32)


# nibble-packing layout version. 1 = pair-interleaved (idx[:,0::2] high /
# idx[:,1::2] low — bitsandbytes' sequential-pair layout, and ours before
# round 3); 2 = half-block (first half of each 64-block in the high
# nibbles — round 3); 3 = half-ROW (the first half of each [out]-row's
# `in` elements in the high nibbles, second half in the low — round 4's
# canonical layout: the fused Pallas dequant-matmul then splits the
# activation with two FREE slices instead of a 32-element-granular lane
# permute that measured 1.26 ms on a [1, 13824] vector, dominating the
# kernel itself). A persisted packed tree from another layout has
# IDENTICAL shapes/dtypes and would silently decode to garbage, so the
# version travels with the weight and decode checks it.
NF4_PACK_PAIRWISE = 1
NF4_PACK_HALFBLOCK = 2
NF4_PACK_HALFROW = 3


class NF4Weight(NamedTuple):
    """Blockwise NF4 matrix: packed 4-bit codes + per-block absmax.

    `pack_format` records the nibble layout (see NF4_PACK_*). Loading a
    bitsandbytes-packed 4-bit checkpoint directly requires repacking
    (`repack_nf4`) — decode refuses a mismatched tree loudly instead of
    producing wrong weights.

    Storage shapes are 2D in the HALFROW format ([out, in/2] packed,
    [out, in/64] absmax): the fused kernel consumes exactly these, and a
    reshape from the legacy [n_blocks, 32] layout inside the decode jit is
    NOT free on TPU — it is a tiled-layout relayout of the whole packed
    tensor per call (measured: it halved the fused kernel's throughput).
    Legacy formats keep [n_blocks, block/2] / [n_blocks]."""

    packed: jax.Array    # uint8 [out, in // 2] (two codes/byte; HALFROW)
    absmax: jax.Array    # f32 [out, in // 64] (HALFROW)
    shape: Tuple[int, int]
    pack_format: int = NF4_PACK_HALFROW


def quantize_nf4(w: jax.Array, block_size: int = 64) -> NF4Weight:
    """[in, out] float -> blockwise NF4. Blocks run along the INPUT axis of
    each output channel (bitsandbytes flattens the torch [out, in] matrix
    row-major), so a block never mixes output channels of different
    magnitude — mixing them measurably hurts accuracy.

    Packing is half-row (NF4_PACK_HALFROW): byte (o, c) holds element
    (o, c) of the [out, in] matrix in its high nibble and (o, c + in/2) in
    the low. Quantization blocks stay 64 CONSECUTIVE row elements
    (bitsandbytes semantics) regardless of the byte layout. Interleaved
    hi/lo packing is avoided deliberately: its [n, block/2, 2] unpack has a
    trailing dim of 2 that TPU tiling pads 64x — measured 8.4 GB of padding
    on ONE 13B layer."""
    shape = tuple(w.shape)
    in_f, out_f = shape
    assert in_f % 2 == 0 and in_f % block_size == 0, shape
    woi = w.astype(jnp.float32).T                 # [out, in]
    blocks = woi.reshape(-1, block_size)
    absmax = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1), 1e-12)
    normed = blocks / absmax[:, None]
    idx = jnp.argmin(
        jnp.abs(normed[..., None] - NF4_CODE[None, None, :]), axis=-1
    ).astype(jnp.uint8).reshape(out_f, in_f)
    hi, lo = idx[:, :in_f // 2], idx[:, in_f // 2:]
    packed = (hi << 4) | lo                       # [out, in/2]
    return NF4Weight(packed=packed,
                     absmax=absmax.reshape(out_f, in_f // block_size),
                     shape=shape)


def _lut16(idx: jax.Array, dtype=jnp.float32) -> jax.Array:
    """16-entry LUT decode as a sum of selects. A `code[idx]` gather over
    billions of elements is catastrophically slow on TPU (measured: ~1.1 s
    to dequantize 13B weights — gather throughput ~6 G/s); 16 vectorized
    compare+FMA ops on the VPU do the same work in tens of ms."""
    out = jnp.zeros(idx.shape, dtype)
    kk = jnp.asarray(np.arange(16), idx.dtype)
    for k in range(16):
        out = out + jnp.asarray(NF4_CODE[k], dtype) * \
            (idx == kk[k]).astype(dtype)
    return out


def _dequant_nf4_oi(q: NF4Weight, dtype=jnp.bfloat16) -> jax.Array:
    """Decode to the STORED [out, in] orientation — no transpose. At 13B
    scale a `.T` back to [in, out] is a full-weight copy XLA must
    materialise (measured: compile-time HBM OOM in the captioner prefill);
    consumers contract against dim 1 instead."""
    if int(q.pack_format) != NF4_PACK_HALFROW:
        raise ValueError(
            f"NF4Weight pack_format={q.pack_format} is not the half-row "
            f"layout ({NF4_PACK_HALFROW}); repack with repack_nf4 "
            "(bitsandbytes / pre-round-3 trees use the pair-interleaved "
            "layout, round-3 trees half-block; both decode to garbage "
            "under the half-row decoder)")
    out_f, in_f = q.shape[1], q.shape[0]
    # stay in uint8 until the final select (int32 indices quadruple the
    # unpack buffers) and keep every intermediate 2D with a wide lane dim —
    # TPU-tiling-friendly, no trailing tiny dims (see quantize_nf4)
    p = q.packed
    vals = jnp.concatenate([_lut16(p >> 4, dtype), _lut16(p & 0xF, dtype)],
                           axis=1)                    # [out, in], row order
    return (vals.reshape(-1, 64)
            * q.absmax.reshape(-1)[:, None].astype(dtype)
            ).reshape(out_f, in_f)


def _unpack_idx(q: NF4Weight) -> jax.Array:
    """Packed tree (any format) -> 4-bit code indices in flat [out*in]
    row-major order, shaped [out, in]."""
    hi, lo = q.packed >> 4, q.packed & 0xF
    out_f, in_f = q.shape[1], q.shape[0]
    fmt = int(q.pack_format)
    if fmt == NF4_PACK_PAIRWISE:
        n, half = q.packed.shape
        idx = jnp.stack([hi, lo], axis=-1).reshape(n, 2 * half)
    elif fmt == NF4_PACK_HALFBLOCK:
        idx = jnp.concatenate([hi, lo], axis=1)
    elif fmt == NF4_PACK_HALFROW:
        return jnp.concatenate(
            [hi.reshape(out_f, in_f // 2), lo.reshape(out_f, in_f // 2)],
            axis=1)
    else:
        raise ValueError(f"unknown pack_format {q.pack_format}")
    return idx.reshape(out_f, in_f)


def repack_nf4(q: NF4Weight) -> NF4Weight:
    """One-time conversion of a pair-interleaved (bitsandbytes / pre-round-3)
    or half-block (round-3) packed tree to the canonical half-row layout
    (including the [n_blocks, 32] -> [out, in/2] storage-shape change).
    The trailing-dim-2 stack in the pairwise unpack is the exact shape
    quantize_nf4's comment warns about — acceptable in a one-time host-side
    conversion, fatal in the per-token decode path."""
    if int(q.pack_format) == NF4_PACK_HALFROW:
        return q
    idx = _unpack_idx(q)
    in_f, out_f = q.shape
    hi, lo = idx[:, :in_f // 2], idx[:, in_f // 2:]
    return NF4Weight(packed=(hi << 4) | lo,
                     absmax=q.absmax.reshape(out_f, in_f // 64),
                     shape=q.shape, pack_format=NF4_PACK_HALFROW)


def dequantize_nf4(q: NF4Weight, dtype=jnp.bfloat16) -> jax.Array:
    return _dequant_nf4_oi(q, jnp.float32).T.astype(dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def nf4_matmul(x: jax.Array, q: NF4Weight, compute_dtype=jnp.bfloat16,
               use_fused: bool = None) -> jax.Array:
    """Weight-only NF4 matmul.

    On TPU (shapes permitting) this dispatches to the fused Pallas
    dequant-matmul (`ops/nf4_matmul.py`): packed codes stream HBM->VMEM and
    decode in registers, so the dequantised weight never round-trips HBM —
    the round-3 wall that left XLA nf4 decode at 1.9 s/token (measured
    results in docs/PERFORMANCE.md). Off-TPU / odd shapes fall back to the
    XLA path: decode (select-sum LUT) then MXU matmul contracting against
    the stored [out, in] layout (the transpose folds into the dot's
    dimension numbers instead of copying the weight)."""
    if use_fused is None:
        from ..ops.nf4_matmul import nf4_fusable

        batch = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        use_fused = _on_tpu() and nf4_fusable(q, batch)
    if use_fused:
        from ..ops.nf4_matmul import nf4_matmul_fused

        return nf4_matmul_fused(x, q, compute_dtype)
    w_oi = _dequant_nf4_oi(q, compute_dtype)
    y = jax.lax.dot_general(
        x.astype(compute_dtype), w_oi,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.astype(compute_dtype)


# ---------------------------------------------------------------------------
# checkpoint delta utilities
# (`/root/reference/llava/model/make_delta.py` / `apply_delta.py` equivalents:
# distribute finetuned weights as deltas vs a base model)
# ---------------------------------------------------------------------------


def make_delta(base_params: Any, target_params: Any) -> Any:
    """target - base per leaf (shapes must match; embedding rows added by
    finetuning are kept verbatim like the reference's dim-mismatch path)."""
    def sub(b, t):
        if b.shape != t.shape:
            return t
        return (t.astype(jnp.float32) - b.astype(jnp.float32)).astype(t.dtype)

    return jax.tree.map(sub, base_params, target_params)


def apply_delta(base_params: Any, delta_params: Any) -> Any:
    def add(b, d):
        if b.shape != d.shape:
            return d
        return (b.astype(jnp.float32) + d.astype(jnp.float32)).astype(d.dtype)

    return jax.tree.map(add, base_params, delta_params)
