"""Spatial transformer blocks (self + cross attention) for the SDXL UNet.

Equivalent to diffusers `Transformer2DModel`/`BasicTransformerBlock` as used
by the reference UNet (`unet_2d_condition_vae_extension.py:269` extends the
diffusers SDXL UNet), built TPU-first: attention runs through
`faithdiff_tpu.ops.attention` (Pallas flash kernel on long sequences), all
projections are bf16-matmul friendly, LayerNorms accumulate fp32.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import GroupNorm, LayerNorm

Dtype = Any

# round-4 experiment switch: packed [b, s, n*d] attention (no BSHD
# transposes around every attention op). Measured A/B in
# docs/PERFORMANCE.md; flip the default once the full-step number is in.
import os as _os

_BSND_ATTN = _os.environ.get("FAITHDIFF_BSND_ATTN", "0") == "1"


class Attention(nn.Module):
    """Multi-head attention with separate q/k/v projections.

    `cross_attention_dim=None` -> self-attention."""

    query_dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    upcast: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        context = x if context is None else context
        inner = self.heads * self.dim_head
        dense = lambda feat, name, bias: nn.Dense(  # noqa: E731
            feat, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        q = dense(inner, "to_q", False)(x)
        k = dense(inner, "to_k", False)(context)
        v = dense(inner, "to_v", False)(context)

        b, sq, _ = q.shape
        sk = k.shape[1]

        if _BSND_ATTN and not self.upcast:
            # packed-layout attention: no BSHD transposes on either side
            # (round-4 experiment against the copy/transpose bucket)
            from ..ops.attention import attention_packed

            out = attention_packed(q, k, v, self.heads).astype(x.dtype)
            return dense(self.query_dim, "to_out", True)(out)

        def heads_first(t, s):
            return t.reshape(b, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = heads_first(q, sq), heads_first(k, sk), heads_first(v, sk)
        if self.upcast:
            qh, kh, vh = (t.astype(jnp.float32) for t in (qh, kh, vh))
        out = multi_head_attention(qh, kh, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, inner).astype(x.dtype)
        return dense(self.query_dim, "to_out", True)(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses exact-erf gelu
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        h = LayerNorm(name="norm1")(x)
        x = x + Attention(self.dim, self.heads, self.dim_head,
                          upcast=self.upcast_attention, dtype=self.dtype,
                          name="attn1")(h)
        h = LayerNorm(name="norm2")(x)
        x = x + Attention(self.dim, self.heads, self.dim_head,
                          cross_attention_dim=self.cross_attention_dim,
                          upcast=self.upcast_attention, dtype=self.dtype,
                          name="attn2")(h, context)
        h = LayerNorm(name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2DModel(nn.Module):
    """GroupNorm -> linear proj-in -> N transformer blocks -> proj-out + res.

    SDXL uses `use_linear_projection=True`; only that path is implemented."""

    in_channels: int
    heads: int
    dim_head: int
    depth: int
    cross_attention_dim: int
    norm_num_groups: int = 32
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        hidden = GroupNorm(self.norm_num_groups, 1e-6, name="norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        hidden = nn.Dense(inner, dtype=self.dtype, param_dtype=jnp.float32,
                          name="proj_in")(hidden)
        for i in range(self.depth):
            hidden = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.cross_attention_dim,
                upcast_attention=self.upcast_attention, dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(hidden, context)
        hidden = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                          name="proj_out")(hidden)
        return hidden.reshape(b, h, w, c) + residual
