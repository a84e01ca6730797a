"""Captioner branch tests: vision tower vs transformers CLIP, LLaMA vs
transformers LlamaModel, KV-cache decode correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from faithdiff_tpu.captioner.clip_vision import (CLIPVisionConfig,
                                                 CLIPVisionTower,
                                                 VisionProjector,
                                                 preprocess_clip_image,
                                                 tiny_vision_config)
from faithdiff_tpu.captioner.llama import (LlamaConfig, LlamaForCausalLM,
                                           greedy_generate, init_kv_caches)
from faithdiff_tpu.utils.convert import convert_state_dict


def test_vision_tower_parity_vs_transformers():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel

    hf_cfg = HFCfg(image_size=56, patch_size=14, hidden_size=32,
                   intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, projection_dim=16)
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = tiny_vision_config()

    from faithdiff_tpu.utils.convert import convert_clip_vision

    params = {"params": convert_clip_vision(hf.state_dict())}

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    ours = CLIPVisionTower(cfg).apply(params, jnp.asarray(pix))
    with torch.no_grad():
        out = hf(torch.from_numpy(pix).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    # select layer -2, CLS dropped
    ref = out.hidden_states[-2][:, 1:, :]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=3e-5)


def test_llama_parity_vs_transformers():
    from transformers import LlamaConfig as HFLlamaCfg
    from transformers import LlamaForCausalLM as HFLlama

    hf_cfg = HFLlamaCfg(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-5, attn_implementation="eager")
    hf = HFLlama(hf_cfg).eval()
    cfg = LlamaConfig.tiny()

    from faithdiff_tpu.utils.convert import convert_llama

    params = {"params": convert_llama(hf.state_dict())}

    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, (2, 10)).astype(np.int32)
    embeds = model.apply(params, jnp.asarray(ids),
                         method=LlamaForCausalLM.embed)
    positions = jnp.broadcast_to(jnp.arange(10)[None], (2, 10))
    logits, _ = model.apply(params, embeds, positions)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(), atol=1e-4)


def test_kv_cache_decode_matches_full_forward():
    """Greedy decode with KV cache must equal argmax over repeated full
    forwards."""
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.standard_normal((1, 5, cfg.hidden_size)),
                         jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 5), jnp.int32),
                        jnp.zeros((1, 5), jnp.int32),
                        method=LlamaForCausalLM.init_forward)

    result = greedy_generate(model, params, prompt, max_new_tokens=4,
                             eos_token_id=-1, temperature=0.0)
    got = np.asarray(result.tokens[0])

    # reference: full forward each step
    embeds = prompt
    ref_tokens = []
    for _ in range(4):
        s = embeds.shape[1]
        pos = jnp.broadcast_to(jnp.arange(s)[None], (1, s))
        logits, _ = model.apply(params, embeds, pos)
        nxt = int(jnp.argmax(logits[0, -1]))
        ref_tokens.append(nxt)
        tok_embed = model.apply(params, jnp.asarray([[nxt]], jnp.int32),
                                method=LlamaForCausalLM.embed)
        embeds = jnp.concatenate([embeds, tok_embed], axis=1)
    np.testing.assert_array_equal(got, np.asarray(ref_tokens))


def test_preprocess_clip_image():
    img = np.zeros((30, 60, 3), np.uint8)
    out = preprocess_clip_image(img, image_size=56)
    assert out.shape == (1, 56, 56, 3)
    # padded to square with CLIP mean -> border pixels normalise to ~0
    assert abs(float(out[0, 0, 28, 0])) < 0.05


def test_projector_shapes():
    proj = VisionProjector(out_dim=16)
    x = jnp.zeros((1, 9, 8))
    params = proj.init(jax.random.PRNGKey(0), x)
    assert proj.apply(params, x).shape == (1, 9, 16)


def test_convert_vision_projector():
    import torch.nn as tnn

    from faithdiff_tpu.utils.convert import convert_vision_projector

    tmod = tnn.Sequential(tnn.Linear(8, 16), tnn.GELU(), tnn.Linear(16, 16))
    sd = {f"mm_projector.{k}": v for k, v in tmod.state_dict().items()}
    params = {"params": convert_vision_projector(sd)}
    x = torch.randn(1, 4, 8)
    ref = tmod(x)
    out = VisionProjector(out_dim=16).apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), atol=1e-5)


def test_int8_llama_matches_fp_closely():
    """quantized=True model with quantize_llama_params weights must track
    the fp model's logits (weight-only int8, ~1% relative error)."""
    from faithdiff_tpu.captioner.llama import quantize_llama_params

    cfg = LlamaConfig.tiny()
    qcfg = LlamaConfig(**{**cfg.__dict__, "quant": "int8"})
    model = LlamaForCausalLM(cfg)
    qmodel = LlamaForCausalLM(qcfg)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 256, (1, 8)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(ids),
                        jnp.zeros((1, 8), jnp.int32),
                        method=LlamaForCausalLM.init_forward)
    qparams = {"params": quantize_llama_params(params["params"])}

    # structure matches the quantized model's expectations
    qinit = qmodel.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.zeros((1, 8), jnp.int32),
                        method=LlamaForCausalLM.init_forward)
    assert jax.tree_util.tree_structure(qinit) == \
        jax.tree_util.tree_structure(qparams)

    logits = model.apply(params, jnp.asarray(ids),
                         jnp.zeros((1, 8), jnp.int32),
                         method=LlamaForCausalLM.init_forward)
    qlogits = qmodel.apply(qparams, jnp.asarray(ids),
                           jnp.zeros((1, 8), jnp.int32),
                           method=LlamaForCausalLM.init_forward)
    denom = float(jnp.abs(logits).mean()) + 1e-8
    rel = float(jnp.abs(qlogits - logits).mean()) / denom
    assert rel < 0.05, rel
    # memory: int8 values dominate -> ~4x smaller than fp32 kernels
    from faithdiff_tpu.utils.quantize import param_bytes

    assert param_bytes(qparams) < 0.45 * param_bytes(params)


def test_nf4_roundtrip_accuracy():
    """NF4 blockwise quantization: dequantized values within the absmax-
    scaled code resolution, exact at the block absmax."""
    from faithdiff_tpu.utils.quantize import (dequantize_nf4, quantize_nf4)

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    q = quantize_nf4(w, block_size=64)
    assert q.packed.shape == (32, 32) and q.absmax.shape == (32, 1)
    back = dequantize_nf4(q, jnp.float32)
    assert back.shape == w.shape
    # worst-case code gap is 0.28 * absmax (around -1..-0.7); typical err ~4%
    # (blocks run along the input axis per output channel -> transpose)
    err = np.abs(np.asarray(back) - np.asarray(w)).T.ravel()
    bounds = np.repeat(np.asarray(q.absmax), 64) * 0.16
    assert (err <= bounds).all()
    # block absmax element reproduces exactly (code +-1.0 maps back)
    flat_w = np.asarray(w).T.ravel()
    flat_b = np.asarray(back).T.ravel()
    for blk in range(4):
        i = np.argmax(np.abs(flat_w[blk * 64:(blk + 1) * 64])) + blk * 64
        np.testing.assert_allclose(flat_b[i], flat_w[i], rtol=1e-6)


def test_nf4_llama_quality_vs_int8():
    """nf4 model must track fp logits; int8 (8 bits) should be at least as
    close as nf4 (4 bits), and both bounded (the reference ships both
    precisions, `llava/model/builder.py:29-38`)."""
    from faithdiff_tpu.captioner.llama import quantize_llama_params
    from faithdiff_tpu.utils.quantize import param_bytes

    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 256, (1, 8)).astype(np.int32)
    pos = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(ids), pos,
                        method=LlamaForCausalLM.init_forward)
    logits = model.apply(params, jnp.asarray(ids), pos,
                         method=LlamaForCausalLM.init_forward)
    denom = float(jnp.abs(logits).mean()) + 1e-8

    rels, sizes = {}, {}
    for mode in ("int8", "nf4"):
        qcfg = LlamaConfig(**{**cfg.__dict__, "quant": mode})
        qmodel = LlamaForCausalLM(qcfg)
        qparams = {"params": quantize_llama_params(params["params"],
                                                   mode=mode)}
        qinit = qmodel.init(jax.random.PRNGKey(0), jnp.asarray(ids), pos,
                            method=LlamaForCausalLM.init_forward)
        assert jax.tree_util.tree_structure(qinit) == \
            jax.tree_util.tree_structure(qparams), mode
        qlogits = qmodel.apply(qparams, jnp.asarray(ids), pos,
                               method=LlamaForCausalLM.init_forward)
        rels[mode] = float(jnp.abs(qlogits - logits).mean()) / denom
        sizes[mode] = param_bytes(qparams)
    assert rels["int8"] < 0.05, rels
    assert rels["nf4"] < 0.30, rels  # random-init tiny model amplifies 4-bit noise
    assert rels["int8"] <= rels["nf4"] + 0.01, rels
    # nf4 packs 2 weights/byte on the layer projections (lm_head stays fp,
    # which dominates only in this tiny vocab-heavy config — on LLaVA-13B
    # the head is 1.2% of params). Check a projection directly:
    def proj_bytes(mode):
        qp = quantize_llama_params(params["params"], mode=mode)
        node = qp["model"]["layers_0"]["self_attn"]["q_proj"]
        return sum(np.asarray(v).nbytes for v in node.values())

    fp_proj = cfg.hidden_size * cfg.hidden_size * 4
    assert proj_bytes("nf4") < 0.20 * fp_proj
    assert proj_bytes("nf4") < 0.6 * proj_bytes("int8")


def test_greedy_generate_keyword_stopping():
    """Generation must stop when the sampled tokens complete a stop
    sequence, excluding the keyword from lengths (KeywordsStoppingCriteria,
    `llava/mm_utils.py:216-247`)."""
    from faithdiff_tpu.captioner.llama import greedy_generate

    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    emb = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 6, cfg.hidden_size)),
        jnp.float32) * 0.1
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 4), jnp.int32),
                        jnp.zeros((1, 4), jnp.int32),
                        method=LlamaForCausalLM.init_forward)
    base = greedy_generate(model, params, emb, max_new_tokens=8,
                           eos_token_id=255)
    # pick the greedy model's own 2nd generated token as a length-1 stop
    # keyword -> generation must stop right after it appears
    kw = int(np.asarray(base.tokens)[0, 1])
    stopped = greedy_generate(model, params, emb, max_new_tokens=8,
                              eos_token_id=255,
                              stop_sequences=((kw,),))
    assert int(stopped.lengths[0]) <= 1
    np.testing.assert_array_equal(
        np.asarray(stopped.tokens)[0, :1], np.asarray(base.tokens)[0, :1])
