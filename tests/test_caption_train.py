"""Captioner finetuning step + conversation template tests."""
import jax
import jax.numpy as jnp
import numpy as np

from faithdiff_tpu.captioner.clip_vision import (CLIPVisionTower,
                                                 VisionProjector,
                                                 tiny_vision_config)
from faithdiff_tpu.captioner.conversation import (TEMPLATES, SeparatorStyle,
                                                  build_prompt)
from faithdiff_tpu.captioner.llama import LlamaConfig, LlamaForCausalLM
from faithdiff_tpu.training.caption_train import (IGNORE_INDEX,
                                                  CaptionTrainState,
                                                  make_caption_optimizer,
                                                  make_caption_train_step)


def test_vicuna_template_prompt():
    p = build_prompt("vicuna_v1", "Describe this image.")
    assert p.startswith("A chat between")
    assert "<image>" in p
    assert p.rstrip().endswith("ASSISTANT:")


def test_llama2_template_prompt():
    p = build_prompt("llava_llama_2", "What?")
    assert "[INST]" in p and "[/INST]" in p
    assert "<<SYS>>" in p


def _setup(trainable):
    vcfg = tiny_vision_config()
    lcfg = LlamaConfig.tiny()
    vision = CLIPVisionTower(vcfg)
    projector = VisionProjector(lcfg.hidden_size)
    llama = LlamaForCausalLM(lcfg)

    pix = jnp.zeros((2, vcfg.image_size, vcfg.image_size, 3))
    vp = vision.init(jax.random.PRNGKey(0), pix)["params"]
    feats = vision.apply({"params": vp}, pix)
    pp = projector.init(jax.random.PRNGKey(1), feats)["params"]
    lp = llama.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32),
                    jnp.zeros((1, 4), jnp.int32),
                    method=LlamaForCausalLM.init_forward)["params"]
    params = {"llama": lp, "vision": vp, "projector": pp}
    tx = make_caption_optimizer(params, trainable=trainable,
                                learning_rate=1e-3, projector_lr=1e-3)
    n_img = feats.shape[1]

    step = make_caption_train_step(
        llama_apply=lambda p, e, pos: llama.apply(p, e, pos),
        embed_apply=lambda p, ids: llama.apply(
            p, ids, method=LlamaForCausalLM.embed),
        vision_apply=lambda p, x: vision.apply(p, x),
        projector_apply=lambda p, f: projector.apply(p, f),
        tx=tx, image_token_pos=2, num_image_tokens=n_img,
    )
    state = CaptionTrainState(jnp.zeros((), jnp.int32), params, tx.init(params))

    rng = np.random.default_rng(0)
    s = 2 + n_img + 8
    ids = rng.integers(3, 200, (2, s)).astype(np.int32)
    labels = np.full((2, s), IGNORE_INDEX, np.int32)
    labels[:, -6:] = rng.integers(3, 200, (2, 6))
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "pixels": jnp.asarray(rng.standard_normal(
            (2, vcfg.image_size, vcfg.image_size, 3)), jnp.float32),
    }
    return state, jax.jit(step), batch


def test_projector_only_training_freezes_lm():
    state, step, batch = _setup("projector")
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    lm_before = jax.tree.leaves(state.params["llama"])[0]
    lm_after = jax.tree.leaves(new_state.params["llama"])[0]
    np.testing.assert_array_equal(np.asarray(lm_before), np.asarray(lm_after))
    pj_before = jax.tree.leaves(state.params["projector"])[0]
    pj_after = jax.tree.leaves(new_state.params["projector"])[0]
    assert np.abs(np.asarray(pj_after) - np.asarray(pj_before)).max() > 0


def test_full_finetune_loss_decreases():
    state, step, batch = _setup("lm")
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
