"""LLaMA decoder for the LLaVA captioner.

Capability-equivalent to the reference's transformers LLaMA-2-13B backbone
(`/root/reference/llava/model/language_model/llava_llama.py`): RMSNorm,
rotary embeddings, SwiGLU MLP, causal attention. TPU-first decode: a
prefill pass (causal flash attention over the multimodal prompt) then a
`lax.while_loop` autoregressive loop over a preallocated KV cache with
static shapes — replacing the reference's flash-attn monkey patches
(`llava/train/llama_flash_attn_monkey_patch.py`) with the Pallas kernel.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 5120
    intermediate_size: int = 13824
    num_hidden_layers: int = 40
    num_attention_heads: int = 40
    num_key_value_heads: int = 40
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # weight-only quantized projections, mirroring the reference's
    # bitsandbytes paths (`llava/model/builder.py:29-38`): "int8"
    # (`load_8bit`) or "nf4" (`load_4bit`). Required to fit LLaVA-13B in one
    # v5e chip's 16 GB HBM (bf16 weights alone are 26 GB; int8 13 GB,
    # nf4 6.6 GB).
    quant: str = ""           # "" | "int8" | "nf4"
    # Mistral-family sliding-window attention (None = full causal). The
    # Mistral binding (`llava/model/language_model/llava_mistral.py`) is the
    # LLaMA architecture + GQA + this window.
    sliding_window: Optional[int] = None

    @property
    def quantized(self) -> bool:
        return bool(self.quant)

    @staticmethod
    def llava_13b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def mistral_7b() -> "LlamaConfig":
        return LlamaConfig(hidden_size=4096, intermediate_size=14336,
                           num_hidden_layers=32, num_attention_heads=32,
                           num_key_value_heads=8,
                           max_position_embeddings=32768,
                           sliding_window=4096)

    @staticmethod
    def tiny_mistral() -> "LlamaConfig":
        return LlamaConfig(vocab_size=256, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           max_position_embeddings=128, sliding_window=8)

    @staticmethod
    def tiny() -> "LlamaConfig":
        return LlamaConfig(vocab_size=256, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=4,
                           max_position_embeddings=128)


class Int8Dense(nn.Module):
    """Weight-only int8 linear: per-output-channel absmax scales, bf16
    matmul with the dequantisation folded into the epilogue."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        values = self.param(
            "values", nn.initializers.zeros, (in_features, self.features),
            jnp.int8)
        scales = self.param(
            "scales", nn.initializers.ones, (self.features,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), values.astype(self.dtype),
                    preferred_element_type=jnp.float32)
        return (y * scales).astype(self.dtype)


class NF4Dense(nn.Module):
    """Weight-only NF4 linear: blockwise 4-bit codes dequantised into the
    matmul prologue (the reference's `load_4bit` bitsandbytes path)."""

    features: int
    dtype: Dtype = jnp.bfloat16
    block_size: int = 64

    @nn.compact
    def __call__(self, x):
        from ..utils.quantize import NF4Weight, nf4_matmul

        in_features = x.shape[-1]
        # half-row 2D storage shapes (NF4_PACK_HALFROW): the fused kernel
        # consumes [out, in/2] / [out, in/64] directly — an in-jit reshape
        # from flat block storage is a whole-tensor relayout on TPU
        packed = self.param("packed", nn.initializers.zeros,
                            (self.features, in_features // 2), jnp.uint8)
        absmax = self.param("absmax", nn.initializers.ones,
                            (self.features, in_features // self.block_size),
                            jnp.float32)
        q = NF4Weight(packed=packed, absmax=absmax,
                      shape=(in_features, self.features))
        return nf4_matmul(x, q, self.dtype)


def _proj(quant, features: int, dtype, name: str):
    # bool kept for backward compatibility (True == int8)
    if quant in ("int8", True):
        return Int8Dense(features, dtype=dtype, name=name)
    if quant == "nf4":
        return NF4Dense(features, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=False, dtype=dtype,
                    param_dtype=jnp.float32, name=name)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        x32 = x32 * jax.lax.rsqrt(var + self.eps)
        return (x32 * w).astype(x.dtype)


def rotary_embed(x: jax.Array, positions: jax.Array,
                 theta: float = 10000.0) -> jax.Array:
    """Apply rotary position embedding. x: [B, H, S, D]; positions: [B, S]."""
    d = x.shape[-1]
    inv_freq = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float32) / d))
    freqs = positions.astype(jnp.float32)[:, :, None] * inv_freq[None, None]
    cos = jnp.cos(freqs)[:, None]          # [B, 1, S, D/2]
    sin = jnp.sin(freqs)[:, None]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class LlamaAttention(nn.Module):
    config: LlamaConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, cache_index=None,
                 attn_len=None, pad_len=None):
        """`pad_len`: optional [B] per-sample LEFT-pad counts — keys at
        cache positions < pad_len[b] are masked out. This is how batched
        variable-length multimodal prompts (e.g. anyres splices with
        differing patch counts, `llava_arch.py:145-324`) run as one static
        batch."""
        cfg = self.config
        d = cfg.hidden_size
        heads = cfg.num_attention_heads
        kv_heads = cfg.num_key_value_heads
        hd = d // heads
        dense = lambda n, feats: _proj(  # noqa: E731
            cfg.quant, feats, self.dtype, n)
        b, s, _ = x.shape
        q = dense("q_proj", heads * hd)(x).reshape(b, s, heads, hd)
        k = dense("k_proj", kv_heads * hd)(x).reshape(b, s, kv_heads, hd)
        v = dense("v_proj", kv_heads * hd)(x).reshape(b, s, kv_heads, hd)
        q = rotary_embed(q.transpose(0, 2, 1, 3), positions, cfg.rope_theta)
        k = rotary_embed(k.transpose(0, 2, 1, 3), positions, cfg.rope_theta)
        v = v.transpose(0, 2, 1, 3)

        if kv_cache is None or s > 1:
            # prefill: pure causal attention over the fresh k/v; when a
            # cache is provided, also write the prompt k/v into it so decode
            # can continue from position s
            new_cache = None
            if kv_cache is not None:
                ck, cv = kv_cache
                ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, cache_index, 0))
                cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, cache_index, 0))
                new_cache = (ck, cv)
            if kv_heads != heads:
                rep = heads // kv_heads
                k = jnp.repeat(k, rep, axis=1)
                v = jnp.repeat(v, rep, axis=1)
            if cfg.sliding_window is not None or pad_len is not None:
                # masked XLA attention: causal + sliding-window (Mistral)
                # and/or left-pad masking (batched variable-length prompts).
                # Prompts are short relative to the window in practice.
                scale = 1.0 / np.sqrt(hd)
                logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                    preferred_element_type=jnp.float32) * scale
                qi = jnp.arange(s)[:, None]
                ki = jnp.arange(s)[None, :]
                mask = (ki <= qi)
                if cfg.sliding_window is not None:
                    mask = mask & (ki > qi - cfg.sliding_window)
                mask = mask[None, None]                      # [1,1,Q,K]
                if pad_len is not None:
                    pad_ok = (jnp.arange(s)[None, None, None, :]
                              >= pad_len[:, None, None, None])  # [B,1,1,K]
                    mask = mask & pad_ok
                logits = jnp.where(mask, logits, -1e30)
                probs = jax.nn.softmax(logits, axis=-1)
                out = jnp.einsum(
                    "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                    preferred_element_type=jnp.float32).astype(q.dtype)
            else:
                out = multi_head_attention(q, k, v, causal=True)
        else:
            # decode: write k/v at cache_index, attend over cache[:attn_len]
            ck, cv = kv_cache                  # [B, KVH, MAX, D]
            ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, cache_index, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, cache_index, 0))
            new_cache = (ck, cv)
            if kv_heads != heads:
                rep = heads // kv_heads
                ck = jnp.repeat(ck, rep, axis=1)
                cv = jnp.repeat(cv, rep, axis=1)
            scale = 1.0 / np.sqrt(hd)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, ck,
                                preferred_element_type=jnp.float32) * scale
            ki = jnp.arange(ck.shape[2])[None, None, None]
            mask = ki <= attn_len
            if cfg.sliding_window is not None:
                mask = mask & (ki > attn_len - cfg.sliding_window)
            if pad_len is not None:
                mask = mask & (ki >= pad_len[:, None, None, None])
            logits = jnp.where(mask, logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(cv.dtype), cv,
                             preferred_element_type=jnp.float32).astype(q.dtype)

        out = out.transpose(0, 2, 1, 3).reshape(b, s, heads * hd)
        return dense("o_proj", d)(out), new_cache


class LlamaLayer(nn.Module):
    config: LlamaConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, cache_index=None,
                 attn_len=None, pad_len=None):
        cfg = self.config
        h = RMSNorm(cfg.rms_norm_eps, name="input_layernorm")(x)
        attn_out, new_cache = LlamaAttention(
            cfg, dtype=self.dtype, name="self_attn")(
                h, positions, kv_cache, cache_index, attn_len, pad_len)
        x = x + attn_out
        h = RMSNorm(cfg.rms_norm_eps, name="post_attention_layernorm")(x)
        gate = _proj(cfg.quant, cfg.intermediate_size, self.dtype,
                     "gate_proj")(h)
        up = _proj(cfg.quant, cfg.intermediate_size, self.dtype,
                   "up_proj")(h)
        down = _proj(cfg.quant, cfg.hidden_size, self.dtype,
                     "down_proj")(jax.nn.silu(gate) * up)
        return x + down, new_cache


class LlamaModel(nn.Module):
    """Backbone accepting input embeddings (the LLaVA path splices image
    embeddings before the backbone, `llava/model/llava_arch.py:145-324`)."""

    config: LlamaConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs_embeds, positions, kv_caches=None,
                 cache_index=None, attn_len=None, pad_len=None):
        cfg = self.config
        x = inputs_embeds
        new_caches = []
        for i in range(cfg.num_hidden_layers):
            cache_i = kv_caches[i] if kv_caches is not None else None
            x, nc = LlamaLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(
                x, positions, cache_i, cache_index, attn_len, pad_len)
            new_caches.append(nc)
        x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)
        return x, (new_caches if kv_caches is not None else None)


class LlamaForCausalLM(nn.Module):
    config: LlamaConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.model = LlamaModel(self.config, dtype=self.dtype)
        self.embed_tokens = nn.Embed(
            self.config.vocab_size, self.config.hidden_size,
            param_dtype=jnp.float32, dtype=self.dtype, name="embed_tokens")
        # transformers' load_in_4bit keeps lm_head at full precision
        # (bitsandbytes skip-modules default); int8 quantizes it like our
        # round-1 path
        head_quant = "" if self.config.quant == "nf4" else self.config.quant
        self.lm_head = _proj(head_quant, self.config.vocab_size,
                             self.dtype, "lm_head")

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def init_forward(self, input_ids, positions):
        """Touches every submodule — use as the `method` for `.init()`."""
        logits, _ = self(self.embed_tokens(input_ids), positions)
        return logits

    def __call__(self, inputs_embeds, positions, kv_caches=None,
                 cache_index=None, attn_len=None, pad_len=None):
        x, caches = self.model(inputs_embeds, positions, kv_caches,
                               cache_index, attn_len, pad_len)
        return self.lm_head(x), caches


def init_kv_caches(cfg: LlamaConfig, batch: int, max_len: int,
                   dtype=jnp.bfloat16):
    hd = cfg.hidden_size // cfg.num_attention_heads
    shape = (batch, cfg.num_key_value_heads, max_len, hd)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.num_hidden_layers)
    ]


class GenerateResult(NamedTuple):
    tokens: jax.Array      # [B, max_new_tokens] generated ids (eos-padded)
    lengths: jax.Array     # [B] number of valid tokens


def _sample_tokens(logits, key, temperature: float, top_p: float):
    """Greedy (temperature<=0) or top-p nucleus sampling (the reference
    samples at temp 0.2 / top-p 0.7, `llava/llm_agent.py:85-94`)."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@functools.lru_cache(maxsize=32)
def _generate_fn(model, max_new_tokens: int, eos_token_id: int,
                 temperature: float, top_p: float, use_pad: bool,
                 stop_seqs: Tuple[Tuple[int, ...], ...]):
    """One jitted program for the WHOLE generate: prefill + a
    `lax.while_loop` decode over the static KV cache, with keyword
    stopping evaluated on device. A single device dispatch per caption
    batch — the previous host-driven loop paid one dispatch plus one
    blocking readback per token, which through the ~0.4 s-latency device
    tunnel dominated decode wall-time entirely."""
    cfg = model.config
    is_mpt = hasattr(cfg, "d_model")   # MPT family (captioner/mpt.py)

    def kw_check(out, col, skip, done, stop_len):
        """Device-side KeywordsStoppingCriteria (`llava/mm_utils.py:
        216-247`): mark samples whose window ending at `col` equals a stop
        sequence; record the keyword-free length. `skip`: samples already
        done before this step keep their state."""
        for seq in stop_seqs:
            ln = len(seq)
            start = col + 1 - ln
            win = jax.lax.dynamic_slice_in_dim(
                out, jnp.maximum(start, 0), ln, axis=1)
            hit = ((start >= 0)
                   & jnp.all(win == jnp.asarray(seq, jnp.int32), axis=1)
                   & ~skip)
            stop_len = jnp.where(hit, jnp.minimum(stop_len, start), stop_len)
            done = done | hit
        return done, stop_len

    def run(params, prompt_embeds, key, pad_len):
        b, s, _ = prompt_embeds.shape
        max_len = s + max_new_tokens

        # ---- prefill: one causal pass over the whole prompt that also
        # writes the prompt k/v into the caches (q len > 1 selects the
        # causal-prefill branch in LlamaAttention)
        if is_mpt:
            from .mpt import init_mpt_kv_caches

            caches = init_mpt_kv_caches(cfg, b, max_len,
                                        dtype=prompt_embeds.dtype)
        else:
            caches = init_kv_caches(cfg, b, max_len,
                                    dtype=prompt_embeds.dtype)
        if use_pad:
            positions = jnp.maximum(
                jnp.arange(s)[None] - pad_len[:, None], 0)
            extra = {"pad_len": pad_len}
        else:
            positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
            extra = {}
        logits, caches = model.apply(params, prompt_embeds, positions,
                                     caches, 0, jnp.asarray(s - 1), **extra)

        key, sub = jax.random.split(key)
        first = _sample_tokens(logits[:, -1, :], sub, temperature, top_p)
        done = first == eos_token_id
        out = jnp.full((b, max_new_tokens), eos_token_id, jnp.int32)
        out = out.at[:, 0].set(first)
        lengths = jnp.ones((b,), jnp.int32)
        stop_len = jnp.full((b,), max_new_tokens + 1, jnp.int32)
        if stop_seqs:
            done, stop_len = kw_check(out, jnp.asarray(0),
                                      jnp.zeros((b,), bool), done, stop_len)

        def cond(c):
            i, done = c[0], c[4]
            return jnp.logical_and(i < max_new_tokens - 1, ~jnp.all(done))

        def body(c):
            i, tok, caches, out, done, key, lengths, stop_len = c
            done_prev = done
            key, sub = jax.random.split(key)
            emb = model.apply(params, tok[:, None], method="embed")
            pos = jnp.broadcast_to(
                jnp.asarray(s)[None, None] + i, (b, 1))
            if use_pad:
                pos = pos - pad_len[:, None]
            logits, caches = model.apply(params, emb, pos, caches, s + i,
                                         jnp.asarray(s) + i, **extra)
            nxt = _sample_tokens(logits[:, -1, :], sub, temperature, top_p)
            nxt = jnp.where(done_prev, eos_token_id, nxt)
            done = jnp.logical_or(done_prev, nxt == eos_token_id)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, nxt[:, None], i + 1, axis=1)
            if stop_seqs:
                done, stop_len = kw_check(out, i + 1, done_prev, done,
                                          stop_len)
            lengths = lengths + (~done).astype(jnp.int32)
            return i + 1, nxt, caches, out, done, key, lengths, stop_len

        c = (jnp.asarray(0), first, caches, out, done, key, lengths,
             stop_len)
        _, _, _, out, _, _, lengths, stop_len = jax.lax.while_loop(
            cond, body, c)
        if stop_seqs:
            lengths = jnp.minimum(lengths, stop_len)
        return out, lengths

    return jax.jit(run)


def greedy_generate(
    model: LlamaForCausalLM,
    params,
    prompt_embeds: jax.Array,         # [B, S, D] multimodal prompt
    max_new_tokens: int,
    eos_token_id: int = 2,
    temperature: float = 0.0,
    top_p: float = 1.0,
    key: Optional[jax.Array] = None,
    stop_sequences: Optional[Tuple[Tuple[int, ...], ...]] = None,
    pad_len: Optional[jax.Array] = None,
) -> GenerateResult:
    """Prefill + autoregressive decode with a static-shape KV cache, as
    ONE jitted device program (`_generate_fn`): prefill, `lax.while_loop`
    decode, on-device keyword stopping. Early exit when every sample is
    done happens inside the loop condition.

    temperature<=0 -> greedy; otherwise top-p nucleus sampling with
    `jax.random` (the reference samples at temp 0.2 / top-p 0.7,
    `llava/llm_agent.py:85-94`).

    `stop_sequences`: per-sample generation stops when its newest tokens
    match any sequence (the reference's `KeywordsStoppingCriteria`,
    `llava/mm_utils.py:216-247`; the keyword tokens are excluded from
    `lengths` like the reference strips the separator).

    `pad_len`: optional [B] LEFT-pad counts for variable-length prompts
    (batched anyres splices, `llava_arch.py:145-324`): padded positions
    are masked out of attention and excluded from rotary positions.
    LLaMA/Mistral family only."""
    cfg = model.config
    b = prompt_embeds.shape[0]
    if pad_len is not None:
        assert not hasattr(cfg, "d_model"), \
            "pad_len (batched anyres) is a LLaMA/Mistral-family feature"
        pl = jnp.asarray(pad_len, jnp.int32)
    else:
        pl = jnp.zeros((b,), jnp.int32)
    stop_seqs = tuple(tuple(int(t) for t in s)
                      for s in (stop_sequences or ()) if len(s))
    fn = _generate_fn(model, int(max_new_tokens), int(eos_token_id),
                      float(temperature), float(top_p), pad_len is not None,
                      stop_seqs)
    if key is None:
        key = jax.random.PRNGKey(0)
    out_tokens, lengths = fn(params, prompt_embeds, key, pl)
    return GenerateResult(tokens=out_tokens, lengths=lengths)


_QUANT_PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
                     "gate_proj", "up_proj", "down_proj", "lm_head")


def quantize_llama_params(params, mode: str = "int8"):
    """fp param tree -> weight-only quantized tree matching the
    `quant="int8"` / `quant="nf4"` module structures.

    int8: Dense kernel [in, out] -> {values int8, scales f32[out]}
    nf4:  Dense kernel [in, out] -> {packed u8[out, in/2],
          absmax f32[out, in/64]} (half-row layout, NF4_PACK_HALFROW)
    (the reference's load_8bit / load_4bit, `llava/model/builder.py:29-38`)
    """
    from ..utils.quantize import quantize_int8, quantize_nf4

    def walk(node, name=""):
        if isinstance(node, dict):
            if name in _QUANT_PROJ_NAMES and set(node) == {"kernel"}:
                if mode == "nf4":
                    if name == "lm_head":   # kept full precision (see setup)
                        return node
                    q = quantize_nf4(jnp.asarray(node["kernel"]))
                    return {"packed": q.packed, "absmax": q.absmax}
                q = quantize_int8(jnp.asarray(node["kernel"]))
                return {"values": q.values, "scales": q.scales}
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)
