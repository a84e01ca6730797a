"""Mistral and MPT LM bindings: sliding window, ALiBi, cache decode,
converters (reference: `llava/model/language_model/llava_mistral.py`,
`llava_mpt.py`)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from faithdiff_tpu.captioner.llama import (LlamaConfig, LlamaForCausalLM,
                                           greedy_generate, init_kv_caches)
from faithdiff_tpu.captioner.mpt import (MPTConfig, MPTForCausalLM,
                                         alibi_slopes, init_mpt_kv_caches)
from faithdiff_tpu.utils.convert import convert_mistral, convert_mpt


def _llama_forward(cfg, seed=0, s=12):
    model = LlamaForCausalLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(seed), (2, s), 0,
                             cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (2, s))
    params = model.init(jax.random.PRNGKey(1), ids, pos,
                        method=LlamaForCausalLM.init_forward)
    emb = model.apply(params, ids, method="embed")
    logits, _ = model.apply(params, emb, pos)
    return model, params, ids, pos, emb, logits


def test_mistral_window_equals_full_causal_for_short_seq():
    """window >= seq -> identical to full causal attention (same params)."""
    base = LlamaConfig.tiny_mistral()
    s = 6  # < window 8
    wide = dataclasses.replace(base, sliding_window=64)
    full = dataclasses.replace(base, sliding_window=None)
    model_w, params, ids, pos, emb, logits_w = _llama_forward(wide, s=s)
    model_f = LlamaForCausalLM(full)
    logits_f, _ = model_f.apply(params, emb, pos)
    np.testing.assert_allclose(np.asarray(logits_w), np.asarray(logits_f),
                               atol=2e-4)


def test_mistral_window_masks_distant_tokens():
    """window < seq -> logits differ from full causal (distant keys hidden)."""
    base = LlamaConfig.tiny_mistral()  # window 8
    s = 32
    _, params, ids, pos, emb, logits_w = _llama_forward(base, s=s)
    model_f = LlamaForCausalLM(dataclasses.replace(base, sliding_window=None))
    logits_f, _ = model_f.apply(params, emb, pos)
    # early positions identical (window not yet binding), late ones differ
    np.testing.assert_allclose(np.asarray(logits_w[:, :8]),
                               np.asarray(logits_f[:, :8]), atol=2e-4)
    assert not np.allclose(np.asarray(logits_w[:, -1]),
                           np.asarray(logits_f[:, -1]), atol=1e-4)


def test_mistral_cached_decode_matches_prefill():
    cfg = LlamaConfig.tiny_mistral()
    s = 12
    model, params, ids, pos, emb, logits_full = _llama_forward(cfg, s=s)
    # prefill s-1, then decode token s-1 through the cache
    caches = init_kv_caches(cfg, 2, s, dtype=jnp.float32)
    _, caches = model.apply(params, emb[:, :s - 1],
                            pos[:, :s - 1], caches, 0,
                            jnp.asarray(s - 2))
    logits_step, _ = model.apply(params, emb[:, s - 1:], pos[:, s - 1:],
                                 caches, s - 1, jnp.asarray(s - 1))
    np.testing.assert_allclose(np.asarray(logits_step[:, 0]),
                               np.asarray(logits_full[:, -1]),
                               atol=5e-4, rtol=1e-3)


def test_alibi_slopes_reference_values():
    # n=8 (power of two): 2^(-i) for i in 1..8
    np.testing.assert_allclose(alibi_slopes(8),
                               [2.0 ** -i for i in range(1, 9)], rtol=1e-6)
    # n=6: computed over 8 then interleaved selection
    s = alibi_slopes(6)
    assert s.shape == (6,) and (np.diff(s[:3]) < 0).all()


def _mpt_forward(cfg, s=10):
    model = MPTForCausalLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, s), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (2, s))
    params = model.init(jax.random.PRNGKey(1), ids, pos,
                        method=MPTForCausalLM.init_forward)
    emb = model.apply(params, ids, method="embed")
    logits, _ = model.apply(params, emb)
    return model, params, ids, emb, logits


def test_mpt_forward_and_tied_head():
    cfg = MPTConfig.tiny()
    model, params, ids, emb, logits = _mpt_forward(cfg)
    assert logits.shape == (2, 10, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # lm_head is tied: no separate head params
    assert "lm_head" not in params["params"]


def test_mpt_position_invariance_is_relative():
    """ALiBi is relative: shifting the (unused) positions arg changes nothing,
    but shuffling tokens changes logits."""
    cfg = MPTConfig.tiny()
    model, params, ids, emb, logits = _mpt_forward(cfg)
    logits2, _ = model.apply(params, emb, jnp.ones((2, 10), jnp.int32) * 5)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))


def test_mpt_cached_decode_matches_prefill():
    cfg = MPTConfig.tiny()
    s = 10
    model, params, ids, emb, logits_full = _mpt_forward(cfg, s=s)
    caches = init_mpt_kv_caches(cfg, 2, s, dtype=jnp.float32)
    _, caches = model.apply(params, emb[:, :s - 1], None, caches, 0,
                            jnp.asarray(s - 2))
    logits_step, _ = model.apply(params, emb[:, s - 1:], None, caches,
                                 s - 1, jnp.asarray(s - 1))
    np.testing.assert_allclose(np.asarray(logits_step[:, 0]),
                               np.asarray(logits_full[:, -1]),
                               atol=5e-4, rtol=1e-3)


def test_mpt_greedy_generate_smoke():
    cfg = MPTConfig.tiny()
    model, params, ids, emb, _ = _mpt_forward(cfg, s=6)
    res = greedy_generate(model, params, emb, max_new_tokens=4,
                          eos_token_id=0, temperature=0.0)
    assert res.tokens.shape == (2, 4)
    assert (np.asarray(res.lengths) <= 4).all()


def test_convert_mpt_structure_matches_init():
    cfg = MPTConfig.tiny()
    model, params, *_ = _mpt_forward(cfg)
    rng = np.random.default_rng(0)
    d, e = cfg.d_model, cfg.expansion_ratio * cfg.d_model
    sd = {"transformer.wte.weight": rng.standard_normal(
        (cfg.vocab_size, d)).astype(np.float32),
        "transformer.norm_f.weight": np.ones(d, np.float32)}
    for i in range(cfg.n_layers):
        p = f"transformer.blocks.{i}"
        sd[f"{p}.norm_1.weight"] = np.ones(d, np.float32)
        sd[f"{p}.norm_2.weight"] = np.ones(d, np.float32)
        sd[f"{p}.attn.Wqkv.weight"] = rng.standard_normal(
            (3 * d, d)).astype(np.float32)
        sd[f"{p}.attn.out_proj.weight"] = rng.standard_normal(
            (d, d)).astype(np.float32)
        sd[f"{p}.ffn.up_proj.weight"] = rng.standard_normal(
            (e, d)).astype(np.float32)
        sd[f"{p}.ffn.down_proj.weight"] = rng.standard_normal(
            (d, e)).astype(np.float32)
    tree = convert_mpt(sd)
    want = jax.tree_util.tree_structure(params["params"])
    got = jax.tree_util.tree_structure(
        jax.tree.map(jnp.asarray, tree))
    assert want == got
    # converted params actually run
    emb = model.apply({"params": tree}, jnp.zeros((1, 4), jnp.int32),
                      method="embed")
    logits, _ = model.apply({"params": tree}, emb)
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_mistral_is_llama_converter():
    assert convert_mistral is not None
    from faithdiff_tpu.utils.convert import convert_llama

    assert convert_mistral is convert_llama
