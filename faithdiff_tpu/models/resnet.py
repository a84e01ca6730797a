"""ResNet / up / down blocks for the UNet and VAE.

Functionally equivalent to the diffusers blocks the reference composes
(`/root/reference/FaithDiff/models/unet_2d_condition_vae_extension.py:27`
imports `UNetMidBlock2D, get_down_block`), redesigned for TPU: NHWC layout,
fp32 GroupNorm statistics, bf16 conv compute, no in-place mutation.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ACT2FN, GroupNorm

Dtype = Any


class ResnetBlock2D(nn.Module):
    """norm→silu→conv, time-embedding injection, norm→silu→conv, residual."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    act_fn: str = "silu"
    output_scale_factor: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        act = ACT2FN[self.act_fn]
        # fold SiLU into the fused GroupNorm apply pass (ops/groupnorm.py)
        fused_act = self.act_fn if self.act_fn == "silu" else None
        in_channels = x.shape[-1]
        h = GroupNorm(self.groups, self.eps, act=fused_act, name="norm1")(x)
        if fused_act is None:
            h = act(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        temb_proj = None
        if temb is not None and self.use_time_emb:
            # injected via GroupNorm's fused `add` prologue: on the Pallas
            # path the h+temb sum never materialises in HBM and no XLA
            # elementwise op is stranded at the kernel boundary
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name="time_emb_proj")(act(temb))
        h = GroupNorm(self.groups, self.eps, act=fused_act,
                      name="norm2")(h, add=temb_proj)
        if fused_act is None:
            h = act(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_shortcut")(x)
        return (x + h) / self.output_scale_factor


class Downsample2D(nn.Module):
    """Strided 3x3 conv downsample.

    `pad_mode="unet"` uses symmetric padding=1; `pad_mode="vae"` uses the
    VAE-encoder convention of (0, 1) padding on H and W.
    """

    out_channels: int
    pad_mode: str = "unet"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.pad_mode == "vae":
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            padding = "VALID"
        else:
            padding = 1
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=padding, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor 2x upsample + 3x3 conv."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, output_size=None) -> jax.Array:
        b, h, w, c = x.shape
        if output_size is None or output_size == (h * 2, w * 2):
            # exact 2x: repeat == torch nearest-neighbor interpolation
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        else:
            x = jax.image.resize(
                x, (b, output_size[0], output_size[1], c), method="nearest"
            )
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)
