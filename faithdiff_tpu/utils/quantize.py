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


class NF4Weight(NamedTuple):
    """Blockwise NF4 matrix: packed 4-bit codes + per-block absmax."""

    packed: jax.Array    # uint8 [n_blocks, block_size // 2] (two codes/byte)
    absmax: jax.Array    # f32 [n_blocks]
    shape: Tuple[int, int]


def quantize_nf4(w: jax.Array, block_size: int = 64) -> NF4Weight:
    """[in, out] float -> blockwise NF4. Blocks run along the INPUT axis of
    each output channel (bitsandbytes flattens the torch [out, in] matrix
    row-major), so a block never mixes output channels of different
    magnitude — mixing them measurably hurts accuracy."""
    shape = tuple(w.shape)
    flat = w.astype(jnp.float32).T.reshape(-1)    # [out, in] row-major
    assert flat.size % block_size == 0, (flat.size, block_size)
    blocks = flat.reshape(-1, block_size)
    absmax = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1), 1e-12)
    normed = blocks / absmax[:, None]
    idx = jnp.argmin(
        jnp.abs(normed[..., None] - NF4_CODE[None, None, :]), axis=-1
    ).astype(jnp.uint8)
    # half-block packing: FIRST half of each block in the high nibbles,
    # second half in the low — dequant is then two [n, block/2] LUT decodes
    # concatenated on axis 1. (An interleaved hi/lo pack needs a
    # [n, block/2, 2] stack whose trailing dim of 2 TPU tiling pads 64x —
    # measured 8.4 GB of padding on ONE 13B layer.)
    hi, lo = idx[:, :block_size // 2], idx[:, block_size // 2:]
    packed = (hi << 4) | lo
    return NF4Weight(packed=packed, absmax=absmax, shape=shape)


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
    # stay in uint8 until the final select (int32 indices quadruple the
    # unpack buffers) and keep every intermediate [n, block/2]-shaped —
    # TPU-tiling-friendly, no trailing tiny dims (see quantize_nf4)
    vals = jnp.concatenate(
        [_lut16(q.packed >> 4, dtype), _lut16(q.packed & 0xF, dtype)],
        axis=1) * q.absmax[:, None].astype(dtype)
    out_f, in_f = q.shape[1], q.shape[0]
    return vals.reshape(out_f, in_f)


def dequantize_nf4(q: NF4Weight, dtype=jnp.bfloat16) -> jax.Array:
    return _dequant_nf4_oi(q, jnp.float32).T.astype(dtype)


def nf4_matmul(x: jax.Array, q: NF4Weight,
               compute_dtype=jnp.bfloat16) -> jax.Array:
    """Weight-only NF4 matmul: decode (select-sum LUT, fused by XLA into
    the matmul prologue) then bf16 MXU matmul contracting against the
    stored [out, in] layout (the transpose folds into the dot's dimension
    numbers instead of copying the weight)."""
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
