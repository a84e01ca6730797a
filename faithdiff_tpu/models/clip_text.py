"""CLIP text towers for SDXL prompt encoding.

Replaces the reference's transformers `CLIPTextModel` (ViT-L/14) +
`CLIPTextModelWithProjection` (OpenCLIP bigG) pair driven by
`encode_prompt` (`/root/reference/FaithDiff/pipelines/pipeline_FaithDiff_tlc.py:485-717`):
SDXL concatenates the *penultimate* hidden states of both towers (768+1280 ->
2048) and keeps the projected pooled output of the second tower (1280).

TPU-first: causal attention over the fixed 77-token context in one fused
XLA attention (no flash kernel needed at this length), fp32 LayerNorms.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import CLIPTextConfig
from ..ops.attention import multi_head_attention
from .layers import ACT2FN, LayerNorm

Dtype = Any


class CLIPMLP(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = ACT2FN[cfg.hidden_act](x)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc2")(x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d = cfg.hidden_size
        heads = cfg.num_attention_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            d, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q, k, v = dense("q_proj")(x), dense("k_proj")(x), dense("v_proj")(x)
        b, s, _ = x.shape
        hd = d // heads

        def split(t):
            return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

        out = multi_head_attention(split(q), split(k), split(v), causal=True)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(
            LayerNorm(cfg.layer_norm_eps, name="layer_norm1")(x))
        x = x + CLIPMLP(cfg, dtype=self.dtype, name="mlp")(
            LayerNorm(cfg.layer_norm_eps, name="layer_norm2")(x))
        return x


class CLIPTextTower(nn.Module):
    """Returns (penultimate_hidden_states, final_hidden_states, pooled).

    `pooled` is the eot-token hidden state after the final LayerNorm, passed
    through `text_projection` when `config.projection_dim` is set (the SDXL
    text_encoder_2 path)."""

    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, eos_token_id: int = 49407
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       param_dtype=jnp.float32, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        x = tok + pos[None, :s, :].astype(self.dtype)

        penultimate = None
        for i in range(cfg.num_hidden_layers):
            if i == cfg.num_hidden_layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(cfg, dtype=self.dtype,
                                 name=f"layers_{i}")(x)
        final = LayerNorm(cfg.layer_norm_eps, name="final_layer_norm")(x)

        # pooled = hidden state at the first eos token (CLIP convention:
        # argmax over ids works because eot has the largest vocab id)
        eot_idx = jnp.argmax(
            (input_ids == eos_token_id).astype(jnp.int32), axis=-1)
        pooled = final[jnp.arange(b), eot_idx]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              dtype=self.dtype, param_dtype=jnp.float32,
                              name="text_projection")(pooled)
        return penultimate, final, pooled


class SDXLTextEncoder(nn.Module):
    """Dual-tower SDXL prompt encoder.

    Output matches the reference `encode_prompt` contract: 2048-dim
    concatenated penultimate states + 1280-dim pooled embeds. The CFG
    negative branch with `force_zeros_for_empty_prompt=True` is plain zeros
    (`pipeline_FaithDiff_tlc.py:622-625`) and is handled by the pipeline."""

    config_1: CLIPTextConfig = CLIPTextConfig.sdxl_text_encoder()
    config_2: CLIPTextConfig = CLIPTextConfig.sdxl_text_encoder_2()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids_1: jax.Array, input_ids_2: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        pen1, _, _ = CLIPTextTower(self.config_1, dtype=self.dtype,
                                   name="text_encoder")(input_ids_1)
        pen2, _, pooled2 = CLIPTextTower(self.config_2, dtype=self.dtype,
                                         name="text_encoder_2")(input_ids_2)
        prompt_embeds = jnp.concatenate([pen1, pen2], axis=-1)
        return prompt_embeds, pooled2
