"""End-to-end caption agent test with tiny random models and a stub
tokenizer (no pretrained files needed)."""
import jax
import jax.numpy as jnp
import numpy as np

from faithdiff_tpu.captioner.agent import CaptionAgent, build_vicuna_prompt
from faithdiff_tpu.captioner.clip_vision import (CLIPVisionTower,
                                                 VisionProjector,
                                                 tiny_vision_config)
from faithdiff_tpu.captioner.llama import LlamaConfig, LlamaForCausalLM


class StubTokenizer:
    eos_token_id = 2

    def __call__(self, text, add_special_tokens=True, return_tensors="np"):
        ids = np.asarray([[1] + [(ord(c) % 200) + 10 for c in text[:16]]],
                         np.int32)
        if not add_special_tokens:
            ids = ids[:, 1:]

        class Enc:
            input_ids = ids

        return Enc()

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(int(i)) for i in ids if int(i) > 2)


def test_caption_agent_end_to_end_tiny():
    vcfg = tiny_vision_config()
    lcfg = LlamaConfig.tiny()
    vision = CLIPVisionTower(vcfg)
    projector = VisionProjector(lcfg.hidden_size)
    llama = LlamaForCausalLM(lcfg)

    pix = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    vp = vision.init(jax.random.PRNGKey(0), pix)
    feats = vision.apply(vp, pix)
    pp = projector.init(jax.random.PRNGKey(1), feats)
    lp = llama.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
                    jnp.zeros((1, 4), jnp.int32),
                    method=LlamaForCausalLM.init_forward)

    agent = CaptionAgent(
        llama=llama, llama_params=lp,
        vision=vision, vision_params=vp,
        projector=projector, projector_params=pp,
        tokenizer=StubTokenizer(),
        max_new_tokens=8, temperature=0.0,
    )
    img = np.random.default_rng(0).integers(0, 255, (40, 64, 3), np.uint8)
    caption = agent.caption(img)
    assert isinstance(caption, str)
    # deterministic greedy decode
    assert caption == agent.caption(img)


def test_vicuna_prompt_structure():
    pre, post = build_vicuna_prompt("What is this?")
    assert pre.endswith("USER: ")
    assert post.endswith("ASSISTANT:")
    assert "What is this?" in post


def test_caption_agent_batched():
    """4-image batch captioning with per-sample lengths (the reference's
    batched gen_image_caption, `llava/llm_agent.py:66-103`)."""
    vcfg = tiny_vision_config()
    lcfg = LlamaConfig.tiny()
    vision = CLIPVisionTower(vcfg)
    projector = VisionProjector(lcfg.hidden_size)
    llama = LlamaForCausalLM(lcfg)

    pix = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    vp = vision.init(jax.random.PRNGKey(0), pix)
    feats = vision.apply(vp, pix)
    pp = projector.init(jax.random.PRNGKey(1), feats)
    lp = llama.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
                    jnp.zeros((1, 4), jnp.int32),
                    method=LlamaForCausalLM.init_forward)
    agent = CaptionAgent(
        llama=llama, llama_params=lp, vision=vision, vision_params=vp,
        projector=projector, projector_params=pp, tokenizer=StubTokenizer(),
        max_new_tokens=6, temperature=0.0)

    rng = np.random.default_rng(1)
    images = [rng.integers(0, 255, (32 + 8 * i, 48, 3), np.uint8)
              for i in range(4)]
    caps = agent.caption_batch(images)
    assert len(caps) == 4 and all(isinstance(c, str) for c in caps)
    # batch row 0 must match the single-image path (greedy, same seed)
    assert caps[0] == agent.caption(images[0])


def test_anyres_multimodal_embeds():
    """anyres flat merge: [1 + patches] x 576 image tokens in the splice
    (`llava_arch.py:160-166` flat path)."""
    vcfg = tiny_vision_config()
    lcfg = LlamaConfig.tiny()
    vision = CLIPVisionTower(vcfg)
    projector = VisionProjector(lcfg.hidden_size)
    llama = LlamaForCausalLM(lcfg)
    pix = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    vp = vision.init(jax.random.PRNGKey(0), pix)
    feats = vision.apply(vp, pix)
    pp = projector.init(jax.random.PRNGKey(1), feats)
    lp = llama.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
                    jnp.zeros((1, 4), jnp.int32),
                    method=LlamaForCausalLM.init_forward)
    from faithdiff_tpu.captioner.agent import CaptionAgent

    agent = CaptionAgent(llama=llama, llama_params=lp, vision=vision,
                         vision_params=vp, projector=projector,
                         projector_params=pp, tokenizer=StubTokenizer())
    img = np.random.default_rng(0).integers(
        0, 255, (40, 80, 3)).astype(np.uint8)
    s = vcfg.image_size
    grids = [(s, 2 * s), (2 * s, s)]
    base, pl0 = agent.build_multimodal_embeds([img], "q?")
    any_e, pl1 = agent.build_multimodal_embeds(
        [img], "q?", image_aspect_ratio="anyres",
        anyres_grid_pinpoints=grids)
    assert pl0 is None and pl1 is None      # uniform lengths -> dense
    n_img = feats.shape[1]
    # 3 stacks (base + 2 patches) -> 2 extra image-token groups
    assert any_e.shape[1] - base.shape[1] == 2 * n_img


def test_anyres_batched_mixed_patch_counts():
    """Batched anyres with DIFFERENT per-sample patch counts (round-2
    missing #5: the old splice asserted batch 1; the reference splices
    per-sample inside a batch, `llava_arch.py:145-324`). Left-padded batch
    + pad_len masking must reproduce each sample's solo greedy caption."""
    vcfg = tiny_vision_config()
    lcfg = LlamaConfig.tiny()
    vision = CLIPVisionTower(vcfg)
    projector = VisionProjector(lcfg.hidden_size)
    llama = LlamaForCausalLM(lcfg)
    pix = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    vp = vision.init(jax.random.PRNGKey(0), pix)
    feats = vision.apply(vp, pix)
    pp = projector.init(jax.random.PRNGKey(1), feats)
    lp = llama.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
                    jnp.zeros((1, 4), jnp.int32),
                    method=LlamaForCausalLM.init_forward)
    agent = CaptionAgent(llama=llama, llama_params=lp, vision=vision,
                         vision_params=vp, projector=projector,
                         projector_params=pp, tokenizer=StubTokenizer(),
                         max_new_tokens=5, temperature=0.0)
    s = vcfg.image_size
    # pinpoints are (width, height): square grid (1 patch) vs wide grid
    # (2 patches side by side)
    grids = [(s, s), (2 * s, s)]
    rng = np.random.default_rng(3)
    img_sq = rng.integers(0, 255, (50, 50, 3)).astype(np.uint8)
    img_wide = rng.integers(0, 255, (40, 90, 3)).astype(np.uint8)

    emb, pad_len = agent.build_multimodal_embeds(
        [img_sq, img_wide], "q?", image_aspect_ratio="anyres",
        anyres_grid_pinpoints=grids)
    assert pad_len is not None
    n_img = feats.shape[1]
    # wide image gets one extra patch group; square sample left-pads by it
    assert int(pad_len[0]) == n_img and int(pad_len[1]) == 0

    caps = agent.caption_batch(
        [img_sq, img_wide], "q?", image_aspect_ratio="anyres",
        anyres_grid_pinpoints=grids)
    solo0 = agent.caption_batch([img_sq], "q?", image_aspect_ratio="anyres",
                                anyres_grid_pinpoints=grids)[0]
    solo1 = agent.caption_batch([img_wide], "q?",
                                image_aspect_ratio="anyres",
                                anyres_grid_pinpoints=grids)[0]
    assert caps == [solo0, solo1]
