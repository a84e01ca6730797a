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

import math
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


def _group_attention_unrolled(q: jax.Array, k: jax.Array, v: jax.Array,
                              n_head: int) -> jax.Array:
    """Attention over a SMALL group axis, pixel-major, transpose-free.

    q/k/v: [B, g, P, d_model] where attention mixes axis 1 (the CFG
    uncond/cond pair at inference, g=2) and (B, P) are batch. Instead of
    transposing ~40 MB activations into a [B*P, g, d] sequence layout for
    the generic attention op (the copy/transpose bucket in the round-2 UNet
    profile), the gxg score maps are computed as unrolled channel
    reductions on the pixel-major arrays — pure VPU work XLA fuses with the
    surrounding projections. Math mirrors `_xla_attention`: fp32 scores,
    max-subtracted softmax, probs cast back to v.dtype for the weighted
    sum."""
    b, g, p, d = q.shape
    hd = d // n_head
    scale = 1.0 / math.sqrt(hd)
    qh = q.reshape(b, g, p, n_head, hd).astype(jnp.float32) * scale
    kh = k.reshape(b, g, p, n_head, hd).astype(jnp.float32)
    vh = v.reshape(b, g, p, n_head, hd)
    # s[i][j]: [B, P, n_head] score of query-group-i vs key-group-j
    s = [[jnp.sum(qh[:, i] * kh[:, j], axis=-1) for j in range(g)]
         for i in range(g)]
    outs = []
    for i in range(g):
        m = s[i][0]
        for j in range(1, g):
            m = jnp.maximum(m, s[i][j])
        e = [jnp.exp(s[i][j] - m) for j in range(g)]
        denom = sum(e)
        o = sum((e[j] / denom).astype(vh.dtype)[..., None] * vh[:, j]
                for j in range(g))
        outs.append(o.reshape(b, p, d))
    return jnp.stack(outs, axis=1).astype(v.dtype)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN residual attention block with packed qkv (torch MHA layout)."""

    d_model: int
    n_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [batch, seq, d_model] (attention over `seq`) or
        [B, g, P, d_model] with small g (attention over the group axis,
        transpose-free — see `_group_attention_unrolled`)."""
        group_mode = x.ndim == 4
        h = LayerNorm(name="ln_1")(x)
        qkv = nn.Dense(3 * self.d_model, dtype=self.dtype,
                       param_dtype=jnp.float32, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if group_mode:
            attn = _group_attention_unrolled(q, k, v, self.n_head)
        else:
            b, s, _ = q.shape
            hd = self.d_model // self.n_head

            def heads_first(t):
                return t.reshape(b, s, self.n_head, hd).transpose(0, 2, 1, 3)

            attn = multi_head_attention(
                heads_first(q), heads_first(k), heads_first(v))
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
        if g <= 4:
            # NHWC-native inference path (g=2 CFG pair): a pure reshape in,
            # a pure reshape out — the pixel<->group transposes of the
            # generic path moved ~40 MB per call at 128^2 latents
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
            return feat.reshape(b, h, w, self.out_channels)
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
