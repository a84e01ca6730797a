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

    sd = {}
    for k, v in hf.state_dict().items():
        k = k.replace("vision_model.embeddings.patch_embedding.",
                      "patch_embedding.")
        k = k.replace("vision_model.embeddings.class_embedding",
                      "class_embedding_raw")
        k = k.replace("vision_model.embeddings.position_embedding.weight",
                      "position_embedding_raw")
        k = k.replace("vision_model.encoder.", "")
        k = k.replace("vision_model.pre_layrnorm.", "pre_layrnorm.")
        k = k.replace("vision_model.post_layernorm.", "post_layernorm.")
        k = k.replace(".self_attn.", ".")
        k = k.replace(".mlp.", ".")
        sd[k] = v
    cls = sd.pop("class_embedding_raw").numpy()
    pos = sd.pop("position_embedding_raw").numpy()
    sd.pop("vision_model.embeddings.position_ids", None)
    sd = {k: v for k, v in sd.items() if not k.startswith("post_layernorm")}
    tree = convert_state_dict(sd)
    tree["class_embedding"] = cls
    tree["position_embedding"] = pos
    params = {"params": tree}

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

    sd = {}
    for k, v in hf.state_dict().items():
        k = k.replace("model.embed_tokens.", "embed_tokens_raw.")
        k = k.replace("model.layers.", "model.layers.")
        k = k.replace("model.norm.", "model.norm.")
        k = k.replace(".self_attn.", ".self_attn.")
        k = k.replace(".mlp.", ".")
        sd[k] = v
    emb = sd.pop("embed_tokens_raw.weight").numpy()
    # norm weights: our RMSNorm param is "weight" (1D) — generic converter
    # maps 1D `weight` to `scale`; rename to match
    tree = convert_state_dict(sd)

    def fix_norms(node):
        if isinstance(node, dict):
            if "scale" in node and len(node) == 1:
                return {"weight": node["scale"]}
            return {k: fix_norms(v) for k, v in node.items()}
        return node

    tree = fix_norms(tree)
    tree["embed_tokens"] = {"embedding": emb}
    params = {"params": tree}

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
