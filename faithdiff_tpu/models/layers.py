"""Core layer kit shared by all models.

TPU conventions used throughout:
- images are NHWC; convolutions use HWIO kernels (XLA:TPU native layout)
- parameters are stored fp32; compute dtype is configurable (bf16 default in
  inference), with normalisations always accumulating in fp32 (mirrors the
  fp16-safe LayerNorm at
  `/root/reference/FaithDiff/models/unet_2d_condition_vae_extension.py:229-235`)
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jax.Array:
    """Sinusoidal timestep embeddings (diffusers `get_timestep_embedding`
    semantics, used by SDXL time + micro-conditioning embeddings).

    Args:
        timesteps: [N] array of timestep values (may be float).
    Returns:
        [N, embedding_dim] fp32 embeddings.
    """
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — CLIP/FaithDiff info-transformer activation
    (`unet_2d_condition_vae_extension.py:222-226`)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACT2FN: dict[str, Callable[[jax.Array], jax.Array]] = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    # "gelu" is the exact erf form (HF convention); "gelu_new" the tanh approx
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics regardless of input dtype.

    On TPU this lowers to the fused two-pass Pallas kernels in
    `ops/groupnorm.py` (profiling showed XLA materialising full-resolution
    fp32 stat partials — the top HBM cost after the convs). `act="silu"`
    folds the activation into the normalise pass, removing an elementwise
    HBM round-trip per ResNet norm.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 add: Optional[jax.Array] = None) -> jax.Array:
        from ..ops.groupnorm import group_norm

        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon,
                          self.act, add=add)


class LayerNorm(nn.Module):
    """fp32-accurate LayerNorm that preserves the input dtype."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        # single-pass statistics (E[x^2] - E[x]^2) so XLA emits one fused
        # reduction pass instead of two dependent full passes
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        m2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        x32 = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (x32 * scale + bias).astype(orig_dtype)


class Conv(nn.Module):
    """3x3/1x1 conv wrapper: fp32 params, compute in `dtype`."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            name="conv",
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            name="dense",
        )(x)


def zeros_init():
    return nn.initializers.zeros


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over sinusoidal embeddings (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    act_fn: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear_1")(sample)
        x = ACT2FN[self.act_fn](x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear_2")(x)
        return x
