"""Full-model checkpoint-layout manifests → converter → flax structure.

Round-4 verdict #2 ("kill the 🟡 rows"): each manifest under
`tests/manifests/` records the COMPLETE key set + shapes of a checkpoint
the restore/caption CLIs consume (provenance in
`scripts/gen_model_manifests.py`). These tests synthesize manifest-shaped
state dicts at FULL scale, run the converters, and prove the resulting
param tree matches the flax models' init structure EXACTLY (both
directions: nothing missing, nothing extra, every shape equal) — so the
day a real checkpoint appears, `cli.py restore`/`caption` load it without
debugging.

Reference layouts being matched:
- FaithDiff.bin flat split-load: `unet_2d_condition_vae_extension.py:444-478`
- SDXL components: `create_FaithDiff_model.py:11-37`
- LLaVA-13B: `llava/model/builder.py:26-148`

The 13B LM test synthesizes ~26 GB and is env-gated
(`FAITHDIFF_FULL_MANIFESTS=1`); its last verified run is recorded in
docs/PARITY.md. Everything else runs in the normal suite.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "manifests")

_FULL = os.environ.get("FAITHDIFF_FULL_MANIFESTS") == "1"


def load_manifest(name: str) -> dict:
    with open(os.path.join(MANIFEST_DIR, name)) as f:
        return json.load(f)


def synth_sd(manifest: dict, seed: int = 0, dtype=np.float16) -> dict:
    """Manifest-shaped state dict. Tensors >4M elements stay zero —
    `np.zeros` is calloc-backed so untouched pages cost nothing, keeping
    full-SDXL/13B synthesis feasible; small tensors draw gaussians so
    norms/biases carry signal."""
    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in manifest.items():
        if shape == "int64":
            sd[key] = np.zeros((), np.int64)
        elif int(np.prod(shape)) > 4_000_000:
            sd[key] = np.zeros(shape, dtype)
        else:
            sd[key] = (rng.standard_normal(shape) * 0.05).astype(dtype)
    return sd


def tree_shapes(tree, prefix=()) -> dict:
    """Flatten a nested param dict to {path: shape}."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_shapes(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(v.shape)
    return out


def assert_same_structure(converted: dict, expected: dict, label: str):
    got = tree_shapes(converted)
    want = tree_shapes(expected)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{label}: {len(missing)} missing (e.g. {missing[:5]}), "
        f"{len(extra)} extra (e.g. {extra[:5]})")
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not bad, f"{label}: shape mismatches (e.g. {bad[:5]})"


# --- SDXL UNet + FaithDiff.bin ---------------------------------------------

def test_faithdiff_bin_full_scale_split_and_convert():
    """The flat FaithDiff.bin layout at FULL SDXL scale: split into
    core/extras exactly like the reference's custom `load_state_dict`,
    convert, and match our full UNet + DenoiseEncoder init structures."""
    from faithdiff_tpu.config import UNetConfig
    from faithdiff_tpu.models.unet import UNet2DConditionModel
    from faithdiff_tpu.models.vae import DenoiseEncoder
    from faithdiff_tpu.utils.convert import (convert_denoise_encoder,
                                             convert_faithdiff_unet,
                                             split_faithdiff_bin)

    manifest = load_manifest("faithdiff_bin.json")
    sd = synth_sd(manifest)
    core, extras = split_faithdiff_bin(sd)
    # the reference's five namespaces, agg_net empty
    # (`init_extra_weights` makes an empty ModuleList)
    assert not extras["agg_net"]
    assert len(extras["denoise_encoder"]) > 90
    # 2 blocks x 12 tensors (packed in_proj w/b, out_proj w/b, ln_1 w/b,
    # ln_2 w/b, mlp.c_fc w/b, mlp.c_proj w/b)
    assert len(extras["information_transformer_layes"]) == 24
    assert len(extras["condition_embedding"]) == 6
    assert len(extras["spatial_ch_projs"]) == 2
    assert len(core) == len(load_manifest("sdxl_unet_diffusers.json"))

    params = convert_faithdiff_unet(core, extras)

    cfg = UNetConfig()  # full SDXL
    model = UNet2DConditionModel(config=cfg)
    expected = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, cfg.cross_attention_dim)), jnp.zeros((1, 1280)),
        jnp.zeros((1, 6)), jnp.zeros((1, 16, 16, cfg.condition_channels)))
    assert_same_structure(params, expected["params"], "faithdiff_unet")

    de_params = convert_denoise_encoder(extras["denoise_encoder"])
    de = DenoiseEncoder()
    de_expected = jax.eval_shape(de.init, jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
    assert_same_structure(de_params, de_expected["params"],
                          "denoise_encoder")


def test_sdxl_vae_fp16_fix_full_scale():
    from faithdiff_tpu.models.vae import AutoencoderKL
    from faithdiff_tpu.utils.convert import convert_vae

    sd = synth_sd(load_manifest("sdxl_vae_fp16_fix.json"))
    params = convert_vae(sd)
    vae = AutoencoderKL()
    expected = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)))
    assert_same_structure(params, expected["params"], "sdxl_vae")


# --- CLIP text encoders ------------------------------------------------------

@pytest.mark.parametrize("manifest,factory,with_projection", [
    ("clip_text_l.json", "sdxl_text_encoder", False),
    ("clip_text_bigg.json", "sdxl_text_encoder_2", True),
])
def test_clip_text_encoders_full_scale(manifest, factory, with_projection):
    from faithdiff_tpu.config import CLIPTextConfig
    from faithdiff_tpu.models.clip_text import CLIPTextTower
    from faithdiff_tpu.utils.convert import convert_clip_text

    sd = synth_sd(load_manifest(manifest))
    params = convert_clip_text(sd, with_projection=with_projection)
    cfg = getattr(CLIPTextConfig, factory)()
    tower = CLIPTextTower(cfg)
    expected = jax.eval_shape(
        tower.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 77), jnp.int32))
    assert_same_structure(params, expected["params"], manifest)


def test_clip_vision_tower_full_scale():
    from faithdiff_tpu.captioner.clip_vision import (CLIPVisionConfig,
                                                     CLIPVisionTower)
    from faithdiff_tpu.utils.convert import convert_clip_vision

    sd = synth_sd(load_manifest("clip_vision_vit_l_336.json"))
    params = convert_clip_vision(sd)
    cfg = CLIPVisionConfig()  # ViT-L/14-336 defaults
    tower = CLIPVisionTower(cfg)
    expected = jax.eval_shape(tower.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 336, 336, 3)))
    assert_same_structure(params, expected["params"], "clip_vision")


# --- LLaVA-13B ---------------------------------------------------------------

def test_llava_13b_projector_keys():
    """The projector slice of the llava-v1.5-13b layout converts without
    the 26 GB LM synthesis (always-on slice of the gated full test)."""
    from faithdiff_tpu.utils.convert import convert_vision_projector

    manifest = load_manifest("llava_13b.json")
    proj_sd = {k[len("model.mm_projector."):]: np.zeros(v, np.float16)
               for k, v in manifest.items()
               if k.startswith("model.mm_projector.")}
    assert sorted(proj_sd) == ["0.bias", "0.weight", "2.bias", "2.weight"]
    params = convert_vision_projector(proj_sd)
    shapes = tree_shapes(params)
    assert shapes[[k for k in shapes if k.endswith("kernel")][0]] in (
        (1024, 5120), (5120, 5120))


@pytest.mark.skipif(not _FULL, reason="26 GB synthesis; set "
                    "FAITHDIFF_FULL_MANIFESTS=1 (run + recorded in "
                    "docs/PARITY.md)")
def test_llava_13b_full_scale():
    from faithdiff_tpu.captioner.llama import LlamaConfig, LlamaForCausalLM
    from faithdiff_tpu.utils.convert import convert_llama

    manifest = load_manifest("llava_13b.json")
    lm_sd = {k: v for k, v in synth_sd(manifest).items()
             if not k.startswith("model.mm_projector.")}
    params = convert_llama(lm_sd)

    cfg = LlamaConfig()  # 13B defaults
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    # `method=` must bind OUTSIDE eval_shape (it abstracts kwargs as
    # array arguments)
    import functools

    e_embed = jax.eval_shape(
        functools.partial(model.init, method=LlamaForCausalLM.embed),
        jax.random.PRNGKey(0), ids)
    embeds = jnp.zeros((1, 4, cfg.hidden_size))
    positions = jnp.broadcast_to(jnp.arange(4)[None], (1, 4))
    e_main = jax.eval_shape(model.init, jax.random.PRNGKey(0), embeds,
                            positions)
    expected = tree_shapes(e_embed["params"])
    expected.update(tree_shapes(e_main["params"]))
    got = tree_shapes(params)
    missing = sorted(set(expected) - set(got))
    extra = sorted(set(got) - set(expected))
    assert not missing and not extra, (missing[:5], extra[:5])
    bad = [(k, got[k], expected[k]) for k in expected
           if got[k] != expected[k]]
    assert not bad, bad[:5]

    # one-token forward through the full-size converted tree
    logits, _ = model.apply({"params": params}, embeds, positions)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


# --- released-key spot checks -------------------------------------------------

def test_known_released_keys_present():
    """Hand-written keys/shapes KNOWN from the released checkpoints —
    guards the mirror-derived manifests against mirror+converter co-drift
    (the transformers-derived ones are the released layouts by
    construction)."""
    unet = load_manifest("sdxl_unet_diffusers.json")
    assert unet["time_embedding.linear_1.weight"] == [1280, 320]
    assert unet["add_embedding.linear_1.weight"] == [1280, 2816]
    assert unet["down_blocks.1.attentions.0.transformer_blocks.1."
                "attn2.to_k.weight"] == [640, 2048]
    assert unet["mid_block.attentions.0.transformer_blocks.9."
                "ff.net.0.proj.weight"] == [10240, 1280]
    assert unet["up_blocks.0.attentions.2.transformer_blocks.9."
                "attn1.to_out.0.weight"] == [1280, 1280]
    assert unet["down_blocks.2.resnets.0.time_emb_proj.weight"] == \
        [1280, 1280]
    assert unet["up_blocks.0.resnets.0.conv_shortcut.weight"] == \
        [1280, 2560, 1, 1]
    assert unet["conv_norm_out.weight"] == [320]
    assert unet["conv_out.weight"] == [4, 320, 3, 3]

    vae = load_manifest("sdxl_vae_fp16_fix.json")
    assert vae["encoder.conv_in.weight"] == [128, 3, 3, 3]
    assert vae["encoder.down_blocks.1.resnets.0.conv_shortcut.weight"] == \
        [256, 128, 1, 1]
    assert vae["encoder.mid_block.attentions.0.to_q.weight"] == [512, 512]
    assert vae["decoder.up_blocks.0.resnets.0.norm1.weight"] == [512]
    assert vae["quant_conv.weight"] == [8, 8, 1, 1]
    assert vae["post_quant_conv.weight"] == [4, 4, 1, 1]

    fd = load_manifest("faithdiff_bin.json")
    assert fd["denoise_encoder.conv_in.weight"] == [128, 3, 3, 3]
    assert fd["denoise_encoder.mid_block.attentions.0.to_out.0.weight"] == \
        [512, 512]
    assert "denoise_encoder.conv_out.weight" not in fd     # headless
    assert "denoise_encoder.conv_norm_out.weight" not in fd
    assert fd["information_transformer_layes.0.attn.in_proj_weight"] == \
        [1920, 640]
    assert fd["information_transformer_layes.1.mlp.c_fc.weight"] == \
        [1280, 640]
    assert fd["spatial_ch_projs.weight"] == [320, 640]
    assert fd["condition_embedding.conv_out.weight"] == [320, 512, 3, 3]
    assert fd["condition_embedding.norm_in.weight"] == [512]

    text_l = load_manifest("clip_text_l.json")
    assert text_l["text_model.encoder.layers.11.self_attn.q_proj.weight"] \
        == [768, 768]
    assert text_l["text_model.embeddings.token_embedding.weight"] == \
        [49408, 768]
    bigg = load_manifest("clip_text_bigg.json")
    assert bigg["text_model.encoder.layers.31.mlp.fc1.weight"] == \
        [5120, 1280]
    assert bigg["text_projection.weight"] == [1280, 1280]

    llava = load_manifest("llava_13b.json")
    assert llava["model.layers.39.self_attn.q_proj.weight"] == [5120, 5120]
    assert llava["model.layers.0.mlp.gate_proj.weight"] == [13824, 5120]
    assert llava["model.mm_projector.0.weight"] == [5120, 1024]
    assert llava["lm_head.weight"] == [32000, 5120]

    vision = load_manifest("clip_vision_vit_l_336.json")
    assert vision["vision_model.embeddings.patch_embedding.weight"] == \
        [1024, 3, 14, 14]
    assert vision["vision_model.embeddings.position_embedding.weight"] == \
        [577, 1024]  # (336/14)^2 + 1 CLS
