"""Weight-conversion parity tests: build real torch modules with random
weights, convert, and require numerical agreement with our flax modules.
This is the gate for FaithDiff.bin / SDXL checkpoint porting fidelity
(SURVEY.md §7 "hard parts": torch NCHW convs / packed qkv vs JAX)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from faithdiff_tpu.config import CLIPTextConfig
from faithdiff_tpu.models.adapters import (ConditionEmbedding,
                                           InformationTransformer,
                                           ResidualAttentionBlock)
from faithdiff_tpu.models.clip_text import CLIPTextTower
from faithdiff_tpu.utils.convert import (convert_clip_text,
                                         convert_state_dict, convert_unet,
                                         split_faithdiff_bin)

torch.manual_seed(0)


def _np(t):
    return t.detach().numpy()


def test_convert_conv_and_linear_layout():
    sd = {
        "conv1.weight": torch.randn(8, 4, 3, 3),
        "conv1.bias": torch.randn(8),
        "lin.weight": torch.randn(16, 8),
        "lin.bias": torch.randn(16),
        "norm1.weight": torch.randn(4),
        "norm1.bias": torch.randn(4),
    }
    tree = convert_state_dict(sd)
    assert tree["conv1"]["kernel"].shape == (3, 3, 4, 8)
    assert tree["lin"]["kernel"].shape == (8, 16)
    assert "scale" in tree["norm1"]


def test_residual_attention_block_parity():
    """Our ResidualAttentionBlock vs the reference structure built in torch
    (`unet_2d_condition_vae_extension.py:238-260`): pre-LN MHA + QuickGELU
    MLP, sequence-first layout."""
    d, heads, seq, batch = 32, 4, 3, 5

    class TorchRAB(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = nn.MultiheadAttention(d, heads)
            self.ln_1 = nn.LayerNorm(d)
            self.mlp = nn.Sequential(
                nn.Linear(d, d * 2), nn.Identity(), nn.Linear(d * 2, d)
            )
            self.ln_2 = nn.LayerNorm(d)

        def forward(self, x):
            h = self.ln_1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            h = self.ln_2(x)
            h = self.mlp[0](h)
            h = h * torch.sigmoid(1.702 * h)
            h = self.mlp[2](h)
            return x + h

    tmod = TorchRAB().eval()
    # convert: torch x is [seq, batch, d]; ours is [batch, seq, d]
    sd = {}
    for k, v in tmod.state_dict().items():
        k = (k.replace("attn.", "")
             .replace("mlp.0.", "mlp_c_fc.")
             .replace("mlp.2.", "mlp_c_proj."))
        sd[k] = v
    params = {"params": convert_state_dict(sd)}

    x = torch.randn(seq, batch, d)
    ref = tmod(x)
    ours = ResidualAttentionBlock(d, heads).apply(
        params, jnp.asarray(_np(x.permute(1, 0, 2)))
    )
    np.testing.assert_allclose(
        np.asarray(ours), _np(ref.permute(1, 0, 2)), atol=2e-5
    )


def test_condition_embedding_parity():
    """vs the reference ControlNetConditioningEmbedding structure
    (`unet_2d_condition_vae_extension.py:199-219`)."""
    cin, cout = 64, 32

    class TorchCE(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(cin, cin, 3, padding=1)
            self.norm_in = nn.GroupNorm(32, cin, eps=1e-6)
            self.conv_out = nn.Conv2d(cin, cout, 3, padding=1)

        def forward(self, x):
            x = self.norm_in(x)
            x = self.conv_in(x)
            x = torch.nn.functional.silu(x)
            return self.conv_out(x)

    tmod = TorchCE().eval()
    params = {"params": convert_state_dict(tmod.state_dict())}
    x = torch.randn(2, cin, 8, 8)
    ref = tmod(x)
    ours = ConditionEmbedding(cout).apply(
        params, jnp.asarray(_np(x.permute(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.asarray(ours), _np(ref.permute(0, 2, 3, 1)), atol=1e-5
    )


def test_information_transformer_batch_axis_semantics():
    """The fusion transformer must reproduce the reference quirk: tokens fed
    to torch MHA with batch_first=False, i.e. attention ACROSS the model
    batch per pixel (`unet_2d_condition_vae_extension.py:576-578`)."""
    c, heads = 16, 4
    d = 2 * c
    b, h, w = 4, 2, 3

    class TorchFusion(nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = nn.ModuleList()
            for _ in range(2):
                blk = nn.ModuleDict({
                    "attn": nn.MultiheadAttention(d, heads),
                    "ln_1": nn.LayerNorm(d),
                    "c_fc": nn.Linear(d, d * 2),
                    "c_proj": nn.Linear(d * 2, d),
                    "ln_2": nn.LayerNorm(d),
                })
                self.blocks.append(blk)
            self.proj = nn.Linear(d, c)

        def forward(self, sample, cond):
            bb, cc, hh, ww = sample.shape
            x = torch.cat([sample, cond], dim=1)
            x = x.view(bb, 2 * cc, hh * ww).transpose(1, 2)  # [b, hw, 2c]
            for blk in self.blocks:
                hdn = blk["ln_1"](x)
                x = x + blk["attn"](hdn, hdn, hdn, need_weights=False)[0]
                hdn = blk["ln_2"](x)
                hdn = blk["c_fc"](hdn)
                hdn = hdn * torch.sigmoid(1.702 * hdn)
                x = x + blk["c_proj"](hdn)
            out = self.proj(x).transpose(1, 2).view(bb, cc, hh, ww)
            return out

    tmod = TorchFusion().eval()
    sd = {}
    for k, v in tmod.state_dict().items():
        k = (k.replace("blocks.", "layers.")
             .replace(".attn.", ".")
             .replace(".c_fc.", ".mlp_c_fc.")
             .replace(".c_proj.", ".mlp_c_proj."))
        if k.startswith("proj."):
            k = k.replace("proj.", "spatial_ch_projs.")
        sd[k] = v
    params = {"params": convert_state_dict(sd)}

    sample = torch.randn(b, c, h, w)
    cond = torch.randn(b, c, h, w)
    ref = tmod(sample, cond)
    ours = InformationTransformer(
        num_layers=2, d_model=d, n_head=heads, out_channels=c
    ).apply(
        params,
        jnp.asarray(_np(sample.permute(0, 2, 3, 1))),
        jnp.asarray(_np(cond.permute(0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.asarray(ours), _np(ref.permute(0, 2, 3, 1)), atol=2e-5
    )


def test_clip_text_tower_parity_vs_transformers():
    """Full CLIP text tower vs a random-init transformers CLIPTextModel."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="gelu", projection_dim=32,
        eos_token_id=999,
    )
    hf = CLIPTextModelWithProjection(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, hidden_act="gelu",
        projection_dim=32,
    )
    params = {"params": convert_clip_text(hf.state_dict())}

    ids = torch.randint(0, 998, (2, 77))
    ids[0, 10] = 999  # eos at position 10 for row 0
    ids[1, 76] = 999
    with torch.no_grad():
        out = hf(ids, output_hidden_states=True)
    pen, final, pooled = CLIPTextTower(cfg).apply(
        params, jnp.asarray(ids.numpy()), eos_token_id=999
    )
    np.testing.assert_allclose(
        np.asarray(pen), _np(out.hidden_states[-2]), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(pooled), _np(out.text_embeds), atol=3e-5
    )


def test_split_faithdiff_bin():
    sd = {
        "conv_in.weight": torch.randn(4, 4, 3, 3),
        "denoise_encoder.conv_in.weight": torch.randn(8, 3, 3, 3),
        "information_transformer_layes.0.ln_1.weight": torch.randn(16),
        "condition_embedding.conv_out.bias": torch.randn(320),
        "spatial_ch_projs.weight": torch.randn(320, 640),
    }
    core, extras = split_faithdiff_bin(sd)
    assert set(core) == {"conv_in.weight"}
    assert set(extras["denoise_encoder"]) == {"conv_in.weight"}
    assert set(extras["spatial_ch_projs"]) == {"weight"}


def test_unet_conversion_structural_roundtrip():
    """Export the tiny UNet's init params to torch/diffusers naming, convert
    back, and require the exact same tree (names, shapes, values). Guards
    conversion completeness for every UNet module incl. FaithDiff extras."""
    import jax
    import jax.numpy as jnp

    from faithdiff_tpu.config import tiny_unet_config
    from faithdiff_tpu.models.unet import UNet2DConditionModel
    from faithdiff_tpu.utils.convert import (convert_unet,
                                             export_to_torch_state_dict)

    cfg = tiny_unet_config()
    model = UNet2DConditionModel(config=cfg)
    b, hw = 1, 16
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, hw, hw, 4)), jnp.zeros((b,)),
        jnp.zeros((b, 77, cfg.cross_attention_dim)), jnp.zeros((b, 64)),
        jnp.zeros((b, 6)),
        jnp.zeros((b, hw, hw, cfg.condition_channels)))["params"]

    sd = export_to_torch_state_dict(params)
    # spot-check diffusers naming conventions are emitted
    keys = set(sd)
    assert "conv_in.weight" in keys
    assert "time_embedding.linear_1.weight" in keys
    assert "add_embedding.linear_1.weight" in keys
    assert "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight" in keys
    assert "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_out.0.weight" in keys
    assert "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in keys
    assert "down_blocks.0.downsamplers.0.conv.weight" in keys
    assert "up_blocks.0.upsamplers.0.conv.weight" in keys
    assert "mid_block.attentions.0.proj_out.weight" in keys
    assert "conv_norm_out.weight" in keys
    assert "condition_embedding.conv_out.weight" in keys
    assert "information_transformer_layes.0.attn.in_proj_weight" in keys
    assert "information_transformer_layes.0.attn.out_proj.weight" in keys
    assert "information_transformer_layes.0.mlp.c_fc.weight" in keys
    assert "spatial_ch_projs.weight" in keys
    # shape conventions
    assert sd["conv_in.weight"].shape == (32, 4, 3, 3)          # OIHW
    assert sd["spatial_ch_projs.weight"].shape == (32, 64)      # [out, in]
    assert sd["information_transformer_layes.0.attn.in_proj_weight"].shape \
        == (3 * 64, 64)

    back = convert_unet(sd)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    paths_a = {tuple(str(getattr(p, "key", p)) for p in path)
               for path, _ in flat_a}
    paths_b = {tuple(str(getattr(p, "key", p)) for p in path)
               for path, _ in flat_b}
    assert paths_a == paths_b, (
        f"missing: {paths_a - paths_b}\nextra: {paths_b - paths_a}")
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=str),
                                  sorted(flat_b, key=str)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=0,
                                   err_msg=str(pa))


def test_vae_conversion_structural_roundtrip():
    import jax
    import jax.numpy as jnp

    from faithdiff_tpu.config import tiny_vae_config
    from faithdiff_tpu.models.vae import AutoencoderKL
    from faithdiff_tpu.utils.convert import (convert_vae,
                                             export_to_torch_state_dict)

    vae = AutoencoderKL(config=tiny_vae_config())
    params = vae.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)))["params"]
    sd = export_to_torch_state_dict(params)
    keys = set(sd)
    assert "encoder.conv_in.weight" in keys
    assert "encoder.down_blocks.0.resnets.0.norm1.weight" in keys
    assert "encoder.down_blocks.0.downsamplers.0.conv.weight" in keys
    assert "encoder.mid_block.attentions.0.group_norm.weight" in keys
    assert "encoder.mid_block.attentions.0.to_out.0.weight" in keys
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in keys
    assert "quant_conv.weight" in keys and "post_quant_conv.weight" in keys

    back = convert_vae(sd)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=str),
                                  sorted(flat_b, key=str)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))


def test_pipeline_from_converted_params_matches_original():
    """Full load path: export tiny init params to torch naming, convert
    back, build the pipeline from them — outputs must be identical."""
    import numpy as _np

    from faithdiff_tpu.pipelines.factory import build_tiny_pipeline
    from faithdiff_tpu.utils.convert import (convert_denoise_encoder,
                                             convert_unet, convert_vae,
                                             export_to_torch_state_dict)

    pipe = build_tiny_pipeline()
    pe = jnp.zeros((1, 77, 64), jnp.float32)
    pooled = jnp.zeros((1, 64), jnp.float32)
    img = _np.random.default_rng(11).random((64, 64, 3)).astype(_np.float32)
    ref = pipe(img, pe, pooled, num_inference_steps=2, seed=5,
               output_type="latent")

    unet_sd = export_to_torch_state_dict(pipe.unet_params["params"])
    vae_sd = export_to_torch_state_dict(pipe.vae_params["params"])
    de_sd = export_to_torch_state_dict(
        pipe.denoise_encoder_params["params"]["encoder"])

    pipe2 = build_tiny_pipeline(
        unet_params={"params": convert_unet(unet_sd)},
        vae_params={"params": convert_vae(vae_sd)},
        denoise_encoder_params={"params": convert_denoise_encoder(de_sd)},
    )
    out = pipe2(img, pe, pooled, num_inference_steps=2, seed=5,
                output_type="latent")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
