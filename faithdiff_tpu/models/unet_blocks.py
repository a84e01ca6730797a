"""UNet and VAE composite blocks.

Equivalents of the diffusers blocks the reference model tree is built from
(SURVEY.md §2.1); NHWC / bf16-compute / fp32-norm TPU conventions.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import GroupNorm
from .resnet import Downsample2D, ResnetBlock2D, Upsample2D
from .transformer2d import Transformer2DModel

Dtype = Any


# ---------------------------------------------------------------------------
# UNet down blocks
# ---------------------------------------------------------------------------

class DownBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        res_outputs = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups,
                              eps=self.eps, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
            res_outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            res_outputs.append(x)
        return x, tuple(res_outputs)


class CrossAttnDownBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    transformer_depth: int = 1
    heads: int = 8
    cross_attention_dim: int = 2048
    add_downsample: bool = True
    groups: int = 32
    eps: float = 1e-5
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        res_outputs = []
        dim_head = self.out_channels // self.heads
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups,
                              eps=self.eps, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(
                self.out_channels, self.heads, dim_head,
                self.transformer_depth, self.cross_attention_dim,
                norm_num_groups=self.groups,
                upcast_attention=self.upcast_attention, dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, context)
            res_outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            res_outputs.append(x)
        return x, tuple(res_outputs)


class UNetMidBlock2DCrossAttn(nn.Module):
    channels: int
    transformer_depth: int = 10
    heads: int = 20
    cross_attention_dim: int = 2048
    groups: int = 32
    eps: float = 1e-5
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.channels, groups=self.groups, eps=self.eps,
                          dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2DModel(
            self.channels, self.heads, self.channels // self.heads,
            self.transformer_depth, self.cross_attention_dim,
            norm_num_groups=self.groups,
            upcast_attention=self.upcast_attention, dtype=self.dtype,
            name="attentions_0",
        )(x, context)
        x = ResnetBlock2D(self.channels, groups=self.groups, eps=self.eps,
                          dtype=self.dtype, name="resnets_1")(x, temb)
        return x


# ---------------------------------------------------------------------------
# UNet up blocks
# ---------------------------------------------------------------------------

class UpBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_hidden_states: Tuple[jax.Array, ...], temb,
                 upsample_size=None):
        for i in range(self.num_layers):
            res = res_hidden_states[-1]
            res_hidden_states = res_hidden_states[:-1]
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.groups,
                              eps=self.eps, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x, upsample_size)
        return x


class CrossAttnUpBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    transformer_depth: int = 1
    heads: int = 8
    cross_attention_dim: int = 2048
    add_upsample: bool = True
    groups: int = 32
    eps: float = 1e-5
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_hidden_states: Tuple[jax.Array, ...], temb,
                 context, upsample_size=None):
        dim_head = self.out_channels // self.heads
        for i in range(self.num_layers):
            res = res_hidden_states[-1]
            res_hidden_states = res_hidden_states[:-1]
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.groups,
                              eps=self.eps, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(
                self.out_channels, self.heads, dim_head,
                self.transformer_depth, self.cross_attention_dim,
                norm_num_groups=self.groups,
                upcast_attention=self.upcast_attention, dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x, upsample_size)
        return x


# ---------------------------------------------------------------------------
# VAE blocks (also used by the FaithDiff denoise_encoder,
# `unet_2d_condition_vae_extension.py:39-196`)
# ---------------------------------------------------------------------------

class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    groups: int = 32
    eps: float = 1e-6
    # PER-RESNET gradient checkpointing. Block-level remat is too coarse
    # for the stage-2 memory fit: the whole block's backward recompute
    # keeps every internal temp of both resnets live at once (measured
    # v5e AOT: six ~0.5 GiB fp32 GroupNorm-backward temps of
    # down_blocks_0 at 512^2 res dominate the 19.55 GiB peak at
    # batch 4/dev). Per-resnet remat halves that working set.
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        _Res = nn.remat(ResnetBlock2D) if self.remat else ResnetBlock2D
        for i in range(self.num_layers):
            x = _Res(self.out_channels, use_time_emb=False,
                     groups=self.groups, eps=self.eps,
                     dtype=self.dtype, name=f"resnets_{i}")(x, None)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, pad_mode="vae",
                             dtype=self.dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, use_time_emb=False,
                              groups=self.groups, eps=self.eps,
                              dtype=self.dtype, name=f"resnets_{i}")(x, None)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class VaeAttention(nn.Module):
    """Single-head spatial self-attention with pre-GroupNorm and biased
    q/k/v/out projections (the VAE mid-block attention)."""

    channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        hidden = GroupNorm(self.groups, self.eps, name="group_norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(  # noqa: E731
            self.channels, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        q = dense("to_q")(hidden)[:, None]   # [b, 1 head, s, c]
        k = dense("to_k")(hidden)[:, None]
        v = dense("to_v")(hidden)[:, None]
        out = multi_head_attention(q, k, v)[:, 0]
        out = dense("to_out")(out)
        return out.reshape(b, h, w, c) + residual


class UNetMidBlock2D(nn.Module):
    """resnet -> (attention) -> resnet, no cross attention (VAE mid block)."""

    channels: int
    add_attention: bool = True
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        x = ResnetBlock2D(self.channels, use_time_emb=temb is not None,
                          groups=self.groups, eps=self.eps, dtype=self.dtype,
                          name="resnets_0")(x, temb)
        if self.add_attention:
            x = VaeAttention(self.channels, groups=self.groups, eps=self.eps,
                             dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, use_time_emb=temb is not None,
                          groups=self.groups, eps=self.eps, dtype=self.dtype,
                          name="resnets_1")(x, temb)
        return x
