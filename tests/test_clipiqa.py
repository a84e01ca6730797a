"""Native CLIPIQA vs the real transformers CLIPModel code (random weights)."""
import dataclasses

import numpy as np
import torch

import jax
import jax.numpy as jnp

from faithdiff_tpu.captioner.clip_vision import CLIPVisionConfig
from faithdiff_tpu.config import CLIPTextConfig
from faithdiff_tpu.eval.clipiqa import (CLIPIQA, convert_clip_model,
                                        make_clipiqa)
from faithdiff_tpu.eval.lpips import save_lpips_params


def _tiny_clip():
    import transformers

    cfg = transformers.CLIPConfig(
        text_config_dict=dict(vocab_size=100, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=2,
                              num_attention_heads=4,
                              max_position_embeddings=16,
                              eos_token_id=99),
        vision_config_dict=dict(image_size=28, patch_size=14,
                                hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2, num_attention_heads=4),
        projection_dim=24,
    )
    torch.manual_seed(0)
    return transformers.CLIPModel(cfg).eval()


def _our_configs():
    vision = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=2,
                              num_attention_heads=4)
    text = CLIPTextConfig(vocab_size=100, hidden_size=32,
                          intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=4, max_position_embeddings=16,
                          projection_dim=24)
    return vision, text


def test_clipiqa_matches_transformers_clip():
    tm = _tiny_clip()
    params = convert_clip_model(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    vision, text = _our_configs()
    model = CLIPIQA(vision, text, eos_token_id=99)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    # two 8-token prompts ending in eos (id 99)
    ids = np.asarray([[1, 5, 6, 7, 8, 9, 10, 99],
                      [1, 5, 6, 7, 8, 9, 11, 99]], np.int64)

    got = float(model.apply({"params": jax.tree.map(jnp.asarray, params)},
                            jnp.asarray(img), prompt_ids=jnp.asarray(ids))[0])

    with torch.no_grad():
        out = tm(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(img).permute(0, 3, 1, 2),
                 attention_mask=torch.ones_like(torch.tensor(ids)))
        want = torch.softmax(out.logits_per_image, dim=-1)[0, 0].item()
    assert abs(got - want) < 2e-3, (got, want)


def test_clipiqa_pos_embed_interpolation_and_gating(tmp_path):
    tm = _tiny_clip()
    params = convert_clip_model(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    vision, text = _our_configs()
    model = CLIPIQA(vision, text, eos_token_id=99)
    ids = np.asarray([[1, 5, 99], [1, 6, 99]], np.int64)
    # 56x56 input on a 28x28-trained trunk: pos embeds interpolate 2x2 -> 4x4
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    score = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                        jnp.asarray(img), prompt_ids=jnp.asarray(ids))
    assert 0.0 < float(score[0]) < 1.0

    # weights-gated factory
    wpath = str(tmp_path / "clipiqa.npz")
    save_lpips_params(params, wpath)
    assert make_clipiqa(str(tmp_path / "none.npz"), prompt_ids=ids) is None
    assert make_clipiqa(wpath) is None  # no prompts -> unavailable

    # self-contained npz: configs + prompts travel with the weights
    from faithdiff_tpu.eval.clipiqa import save_clipiqa_weights

    wpath2 = str(tmp_path / "clipiqa_sc.npz")
    save_clipiqa_weights(params, wpath2, vision, text, eos_token_id=99,
                         prompt_ids=ids)
    fn = make_clipiqa(wpath2, resolution=28)
    assert fn is not None
    img01 = np.random.default_rng(2).uniform(
        size=(28, 28, 3)).astype(np.float32)
    assert 0.0 < fn(img01) < 1.0
    # learned-prompt (CLIPIQA+) path: [2, proj] embeddings
    pe = rng.standard_normal((2, 24)).astype(np.float32)
    score2 = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                         jnp.asarray(img), prompt_embeds=jnp.asarray(pe))
    assert 0.0 < float(score2[0]) < 1.0
