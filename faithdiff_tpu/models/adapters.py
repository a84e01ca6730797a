"""FaithDiff adapter modules: LQ-feature condition embedding and the
"information transformer" fusion stack.

Reference: `/root/reference/FaithDiff/models/unet_2d_condition_vae_extension.py`
- `ControlNetConditioningEmbedding` (:199-219): GroupNorm -> 3x3 conv -> SiLU
  -> zero-init 3x3 conv, 512 -> 320 channels.
- `ResidualAttentionBlock` (:238-260): pre-LN MHA + 2x-MLP with QuickGELU.

IMPORTANT semantic note: the reference passes `[batch, h*w, 640]` tokens to
`nn.MultiheadAttention` with the default `batch_first=False`, so the
*sequence* axis is the model batch (the CFG uncond/cond pair at inference;
the image batch in training) and each spatial location is an independent
attention "batch" entry. The pretrained weights were learned under this
convention, so we reproduce it exactly: attention mixes the `group` axis
(size 2 at inference) per pixel, not pixels with each other.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import GroupNorm, LayerNorm, quick_gelu

Dtype = Any


class ConditionEmbedding(nn.Module):
    """ControlNet-style stem over denoise_encoder features."""

    out_channels: int = 320
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = GroupNorm(32, 1e-6, name="norm_in")(x)
        x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        x = jax.nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv_out")(x)
        return x


class ResidualAttentionBlock(nn.Module):
    """Pre-LN residual attention block with packed qkv (torch MHA layout)."""

    d_model: int
    n_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [batch, seq, d_model]; attention runs over `seq`."""
        h = LayerNorm(name="ln_1")(x)
        qkv = nn.Dense(3 * self.d_model, dtype=self.dtype,
                       param_dtype=jnp.float32, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = q.shape
        hd = self.d_model // self.n_head

        def heads_first(t):
            return t.reshape(b, s, self.n_head, hd).transpose(0, 2, 1, 3)

        attn = multi_head_attention(heads_first(q), heads_first(k), heads_first(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, self.d_model)
        attn = nn.Dense(self.d_model, dtype=self.dtype,
                        param_dtype=jnp.float32, name="out_proj")(attn)
        x = x + attn

        h = LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.d_model * 2, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_c_proj")(h)
        return x + h


class InformationTransformer(nn.Module):
    """The FaithDiff fusion transformer + zero-init spatial projection.

    Input: UNet post-conv_in features and condition embedding, both
    [group, H, W, 320]. Tokens are formed per spatial location across the
    `group` axis (see module docstring); output is the 320-channel residual
    `feat_alpha` (`unet_2d_condition_vae_extension.py:570-579`).
    """

    num_layers: int = 2
    d_model: int = 640
    n_head: int = 8
    out_channels: int = 320
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, sample: jax.Array, cond: jax.Array, group_size: int | None = None
    ) -> jax.Array:
        """sample, cond: [B, H, W, C]. `group_size` G divides B; attention
        mixes each contiguous group of G batch entries (the reference's
        sequence axis). G=None -> the whole batch is one group (reference
        training semantics); at tiled inference pass G=2 so only each tile's
        CFG pair communicates, exactly like the per-tile reference loop."""
        b, h, w, c = sample.shape
        g = b if group_size is None else group_size
        assert b % g == 0, (b, g)
        tokens = jnp.concatenate([sample, cond], axis=-1)     # [b, h, w, 2c]
        # torch MHA batch_first=False layout: seq = model batch (g),
        # attention "batch" = pixels (and independent groups)
        tokens = tokens.reshape(b // g, g, h * w, 2 * c)
        tokens = tokens.transpose(0, 2, 1, 3).reshape(b // g * h * w, g, 2 * c)
        for i in range(self.num_layers):
            tokens = ResidualAttentionBlock(
                self.d_model, self.n_head, dtype=self.dtype,
                name=f"layers_{i}",
            )(tokens)
        feat = nn.Dense(self.out_channels, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="spatial_ch_projs")(tokens)
        feat = feat.reshape(b // g, h * w, g, self.out_channels)
        feat = feat.transpose(0, 2, 1, 3).reshape(b, h, w, self.out_channels)
        return feat
