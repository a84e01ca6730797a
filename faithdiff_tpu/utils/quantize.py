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
