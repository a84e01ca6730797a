"""MPT decoder binding for the captioner.

Capability-equivalent to the reference's MPT language-model binding
(`/root/reference/llava/model/language_model/llava_mpt.py`, backed by the
vendored `mpt/modeling_mpt.py`): pre-LN blocks with a fused Wqkv
projection, ALiBi position biases (no rotary / learned positions), GELU
MLP at 4x expansion, and an lm_head tied to the token embedding.

The call signature mirrors `LlamaForCausalLM` (inputs_embeds, positions,
kv_caches, cache_index, attn_len) so `greedy_generate` and the caption
agent drive either family unchanged; `positions` is accepted and unused
(ALiBi is relative).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    vocab_size: int = 50432
    d_model: int = 4096
    n_heads: int = 32
    n_layers: int = 32
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    alibi_bias_max: float = 8.0
    layer_norm_eps: float = 1e-5

    @staticmethod
    def tiny() -> "MPTConfig":
        return MPTConfig(vocab_size=256, d_model=64, n_heads=4, n_layers=2,
                         max_seq_len=128)


def alibi_slopes(n_heads: int, bias_max: float = 8.0) -> np.ndarray:
    """ALiBi head slopes: 2^(-bias_max * i / n) over the next power of two
    of n_heads, then every other slope when n is not a power of two (the
    MPT `build_alibi_bias` convention)."""
    n = 2 ** int(np.ceil(np.log2(n_heads)))
    m = np.arange(1, n + 1, dtype=np.float32) * (bias_max / n)
    slopes = 1.0 / np.power(2.0, m)
    if n != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes


class LayerNormNoBias(nn.Module):
    """MPT uses low-precision LayerNorm without bias (`no_bias=True`)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + self.eps) * w).astype(
            x.dtype)


class MPTAttention(nn.Module):
    config: MPTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv_cache=None, cache_index=None, attn_len=None):
        cfg = self.config
        d = cfg.d_model
        heads = cfg.n_heads
        hd = d // heads
        b, s, _ = x.shape
        qkv = nn.Dense(3 * d, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="Wqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / np.sqrt(hd)
        slopes = jnp.asarray(alibi_slopes(heads, cfg.alibi_bias_max))

        if kv_cache is None or s > 1:
            new_cache = None
            if kv_cache is not None:
                ck, cv = kv_cache
                ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, cache_index, 0))
                cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, cache_index, 0))
                new_cache = (ck, cv)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            qi = jnp.arange(s)[:, None]
            ki = jnp.arange(s)[None, :]
            # ALiBi: bias = -slope * (q_pos - k_pos), causal masked
            bias = -slopes[:, None, None] * (qi - ki).astype(jnp.float32)
            logits = logits + bias[None]
            logits = jnp.where((ki <= qi)[None, None], logits, -1e30)
        else:
            ck, cv = kv_cache
            ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, cache_index, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, cache_index, 0))
            new_cache = (ck, cv)
            k, v = ck, cv
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            ki = jnp.arange(k.shape[2])[None, :]
            bias = -slopes[:, None, None] * (attn_len - ki).astype(jnp.float32)
            logits = logits + bias[None]
            logits = jnp.where((ki <= attn_len)[None, None], logits, -1e30)

        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, d)
        return nn.Dense(d, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="out_proj")(out), new_cache


class MPTBlock(nn.Module):
    config: MPTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv_cache=None, cache_index=None, attn_len=None):
        cfg = self.config
        h = LayerNormNoBias(cfg.layer_norm_eps, name="norm_1")(x)
        attn_out, new_cache = MPTAttention(cfg, dtype=self.dtype,
                                           name="attn")(
            h, kv_cache, cache_index, attn_len)
        x = x + attn_out
        h = LayerNormNoBias(cfg.layer_norm_eps, name="norm_2")(x)
        up = nn.Dense(cfg.expansion_ratio * cfg.d_model, use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="up_proj")(h)
        down = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name="down_proj")(jax.nn.gelu(up, approximate=False))
        return x + down, new_cache


class MPTForCausalLM(nn.Module):
    config: MPTConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.wte = nn.Embed(cfg.vocab_size, cfg.d_model,
                            param_dtype=jnp.float32, dtype=self.dtype,
                            name="wte")
        self.blocks = [MPTBlock(cfg, dtype=self.dtype, name=f"blocks_{i}")
                       for i in range(cfg.n_layers)]
        self.norm_f = LayerNormNoBias(cfg.layer_norm_eps, name="norm_f")

    def embed(self, input_ids):
        return self.wte(input_ids)

    def init_forward(self, input_ids, positions):
        logits, _ = self(self.wte(input_ids), positions)
        return logits

    def __call__(self, inputs_embeds, positions=None, kv_caches=None,
                 cache_index=None, attn_len=None):
        del positions  # ALiBi: relative biases only
        x = inputs_embeds
        new_caches = []
        for i, block in enumerate(self.blocks):
            cache_i = kv_caches[i] if kv_caches is not None else None
            x, nc = block(x, cache_i, cache_index, attn_len)
            new_caches.append(nc)
        x = self.norm_f(x)
        # lm_head tied to wte (MPT has no separate output projection)
        logits = self.wte.attend(x.astype(jnp.float32))
        return logits.astype(self.dtype), (
            new_caches if kv_caches is not None else None)


def init_mpt_kv_caches(cfg: MPTConfig, batch: int, max_len: int,
                       dtype=jnp.bfloat16):
    hd = cfg.d_model // cfg.n_heads
    return [
        (jnp.zeros((batch, cfg.n_heads, max_len, hd), dtype),
         jnp.zeros((batch, cfg.n_heads, max_len, hd), dtype))
        for _ in range(cfg.n_layers)
    ]
