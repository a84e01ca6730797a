"""scripts/prepare_checkpoint.py: released torch files -> CLI checkpoint
layout -> `cli.py restore` executes end-to-end from the converted trees.

This is the checkpoint-free proof of the full restore path the reference
runs with downloaded weights (`create_FaithDiff_model.py:11-37` +
`test.py:130`): a flat FaithDiff.bin-layout state dict (tiny config, real
torch modules from `torch_sdxl_ref.py` so the key set matches the released
layout shape-for-shape) + a base SDXL-layout unet + a diffusers-layout VAE
are converted, written to disk, and consumed by the restore CLI."""
import json
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "scripts"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import torch_sdxl_ref as tref  # noqa: E402
from faithdiff_tpu.config import (tiny_unet_config,  # noqa: E402
                                  tiny_vae_config)


def _faithdiff_bin_sd():
    """Flat FaithDiff.bin layout: FaithDiffUNet's state dict already carries
    the fusion namespaces (information_transformer_layes./
    condition_embedding./spatial_ch_projs.); add denoise_encoder.*."""
    cfg = tiny_unet_config()
    tmod = tref.FaithDiffUNet(cfg).eval()
    with torch.no_grad():
        for p in (tmod.spatial_ch_projs.weight, tmod.spatial_ch_projs.bias,
                  tmod.condition_embedding.conv_out.weight,
                  tmod.condition_embedding.conv_out.bias):
            p.copy_(torch.randn_like(p) * 0.1)
    sd = {k: v.clone() for k, v in tmod.state_dict().items()}
    de = tref.Encoder((16, 32, 64, 64), 2, groups=8, with_head=False).eval()
    for k, v in de.state_dict().items():
        sd[f"denoise_encoder.{k}"] = v.clone()
    return sd


def _vae_sd():
    cfg = tiny_vae_config()
    tmod = tref.AutoencoderKL(cfg.block_out_channels, cfg.layers_per_block,
                              cfg.latent_channels, cfg.norm_num_groups).eval()
    return {k: v.clone() for k, v in tmod.state_dict().items()}


def test_prepare_then_restore_end_to_end(tmp_path):
    from PIL import Image

    from prepare_checkpoint import prepare

    out = tmp_path / "ckpt"
    written = prepare(out=str(out), state_dicts={
        "faithdiff_bin": _faithdiff_bin_sd(),
        "vae": _vae_sd(),
    })
    assert set(written) == {"unet", "denoise_encoder", "vae"}
    for sub in ("unet", "denoise_encoder", "vae"):
        assert os.path.exists(out / sub)

    img_dir, save_dir, json_dir = (tmp_path / d
                                   for d in ("in", "sr", "caps"))
    img_dir.mkdir(), json_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (24, 24, 3), np.uint8)).save(
        img_dir / "x.png")
    with open(json_dir / "x.json", "w") as f:
        json.dump({"caption": "a b c photo of a cat. nice. more."}, f)

    from faithdiff_tpu.cli import main

    main(["restore", "--img_dir", str(img_dir), "--save_dir", str(save_dir),
          "--json_dir", str(json_dir), "--tiny", "--upscale", "2",
          "--num_inference_steps", "2", "--latent_tiled_size", "64",
          "--checkpoint_dir", str(out)])
    res = np.asarray(Image.open(save_dir / "x.png"))
    assert res.shape == (48, 48, 3)
    assert res.std() > 0


def test_prepare_core_override_semantics(tmp_path):
    """Core UNet keys present in the bin override the base SDXL unet
    (the reference's non-strict load-over, `:444-478`)."""
    from prepare_checkpoint import prepare

    bin_sd = _faithdiff_bin_sd()
    base = {k: torch.zeros_like(v) for k, v in bin_sd.items()
            if not any(k.startswith(ns) for ns in (
                "denoise_encoder.", "information_transformer_layes.",
                "condition_embedding.", "spatial_ch_projs.", "agg_net."))}
    out = tmp_path / "ckpt"
    prepare(out=str(out), state_dicts={
        "faithdiff_bin": bin_sd, "unet": base})

    from faithdiff_tpu.training.checkpoint import load_params

    tree = load_params(str(out / "unet"))
    import jax
    leaves = jax.tree.leaves(tree)
    # if the zeroed base had won, everything would be zero
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)


def test_prepare_nothing_returns_empty(tmp_path):
    from prepare_checkpoint import prepare

    assert prepare(out=str(tmp_path / "o")) == {}


def test_prepare_captioner_layout(tmp_path):
    """Released llava-v1.5 layout (transformers LM keys + model.mm_projector)
    + the separately-shipped CLIP tower convert into the exact
    `captioner/{llama,vision,projector}` directory layout
    `CaptionAgent.from_checkpoint` reads (reference builder flow,
    `llava/model/builder.py:26-148`)."""
    from transformers import CLIPVisionConfig as HFVCfg
    from transformers import CLIPVisionModel
    from transformers import LlamaConfig as HFLCfg
    from transformers import LlamaForCausalLM as HFLlama

    from prepare_checkpoint import prepare

    hf_lm = HFLlama(HFLCfg(vocab_size=64, hidden_size=16,
                           intermediate_size=32, num_hidden_layers=2,
                           num_attention_heads=4,
                           num_key_value_heads=4)).eval()
    llava_sd = {k: v.clone() for k, v in hf_lm.state_dict().items()}
    # mlp2x_gelu projector in the released key naming
    llava_sd["model.mm_projector.0.weight"] = torch.randn(16, 8)
    llava_sd["model.mm_projector.0.bias"] = torch.randn(16)
    llava_sd["model.mm_projector.2.weight"] = torch.randn(16, 16)
    llava_sd["model.mm_projector.2.bias"] = torch.randn(16)
    hf_clip = CLIPVisionModel(HFVCfg(
        image_size=56, patch_size=14, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        projection_dim=16)).eval()

    out = tmp_path / "ckpt"
    written = prepare(out=str(out), state_dicts={
        "llava": llava_sd,
        "clip_vision": {k: v.clone() for k, v in
                        hf_clip.state_dict().items()},
    })
    assert set(written) == {"captioner/llama", "captioner/projector",
                            "captioner/vision"}
    from faithdiff_tpu.training.checkpoint import load_params

    cap = out / "captioner"
    llama_tree = load_params(str(cap / "llama"))
    assert "embed_tokens" in llama_tree and "lm_head" in llama_tree
    proj_tree = load_params(str(cap / "projector"))
    kernels = [k for k in _flat_keys(proj_tree) if k.endswith("kernel")]
    assert len(kernels) == 2
    vision_tree = load_params(str(cap / "vision"))
    assert any("patch_embedding" in k for k in _flat_keys(vision_tree))
    # the LM tree feeds quantize_llama_params exactly as from_checkpoint
    # does (the 13B-scale load itself is the env-gated manifest test)
    from faithdiff_tpu.captioner.llama import quantize_llama_params

    q = quantize_llama_params(llama_tree, mode="int8")
    assert _flat_keys(q)


def _flat_keys(tree, prefix=""):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += _flat_keys(v, f"{prefix}{k}/")
    else:
        out.append(prefix[:-1])
    return out


def test_prepare_clip_vision_without_llava(tmp_path):
    """--clip_vision alone converts the tower (the two released files are
    independent downloads; the reference builder loads the tower separately,
    `llava/model/builder.py:137-141`)."""
    from transformers import CLIPVisionConfig as HFVCfg
    from transformers import CLIPVisionModel

    from prepare_checkpoint import prepare

    hf_clip = CLIPVisionModel(HFVCfg(
        image_size=56, patch_size=14, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, projection_dim=16)).eval()
    out = tmp_path / "ckpt"
    written = prepare(out=str(out), state_dicts={
        "clip_vision": {k: v.clone() for k, v in
                        hf_clip.state_dict().items()}})
    assert set(written) == {"captioner/vision"}
    assert os.path.isdir(out / "captioner" / "vision")


def test_load_sharded_checkpoint(tmp_path):
    """HF-style sharded layout (N bins + *.index.json — how llava-v1.5-13b
    actually ships) loads and merges; _load resolves a directory, an
    index path, or a missing single-file path to the index."""
    from prepare_checkpoint import _load

    shards = {
        "pytorch_model-00001-of-00002.bin": {
            "a.weight": torch.randn(2, 3), "b.weight": torch.randn(4)},
        "pytorch_model-00002-of-00002.bin": {"c.bias": torch.randn(5)},
    }
    weight_map = {k: fname for fname, sd in shards.items() for k in sd}
    for fname, sd in shards.items():
        torch.save(sd, tmp_path / fname)
    with open(tmp_path / "pytorch_model.bin.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)

    for path in (str(tmp_path / "pytorch_model.bin.index.json"),
                 str(tmp_path),
                 str(tmp_path / "pytorch_model.bin")):  # missing single file
        merged = _load(path)
        assert set(merged) == {"a.weight", "b.weight", "c.bias"}
        assert merged["a.weight"].shape == (2, 3)

    # an index naming a key absent from its shards must fail loudly
    weight_map["ghost"] = "pytorch_model-00001-of-00002.bin"
    with open(tmp_path / "pytorch_model.bin.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    with pytest.raises(KeyError):
        _load(str(tmp_path))
