"""Numerical parity of the core SDXL UNet blocks and VAE vs torch fixtures.

Round-1 gap (VERDICT.md item 2): adapters/CLIP were parity-tested but the
UNet block math and VAE had only structural round-trips. These tests build
the reference block math in torch (`tests/torch_sdxl_ref.py`, mirroring the
diffusers modules the reference composes at
`/root/reference/FaithDiff/models/unet_2d_condition_vae_extension.py:27-269`),
feed random state dicts through `utils/convert.py`, and require numerical
agreement — the checkpoint-free defense of "bit-comparable latents".
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

import torch_sdxl_ref as tref
from faithdiff_tpu.config import tiny_unet_config, tiny_vae_config
from faithdiff_tpu.models.resnet import ResnetBlock2D
from faithdiff_tpu.models.transformer2d import Transformer2DModel
from faithdiff_tpu.models.unet import UNet2DConditionModel
from faithdiff_tpu.models.vae import AutoencoderKL, DenoiseEncoder
from faithdiff_tpu.utils.convert import (convert_denoise_encoder,
                                         convert_state_dict, convert_unet,
                                         convert_vae)

torch.manual_seed(7)


def _nhwc(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _from_nchw_ref(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_resnet_block_parity():
    """ResnetBlock2D with time embedding and channel-changing shortcut."""
    cin, cout, temb_dim, groups = 16, 32, 24, 8
    tmod = tref.ResnetBlock2D(cin, cout, temb_dim, groups).eval()
    params = {"params": convert_state_dict(tmod.state_dict())}

    x = torch.randn(2, cin, 8, 8)
    temb = torch.randn(2, temb_dim)
    with torch.no_grad():
        ref = tmod(x, temb)
    ours = ResnetBlock2D(cout, groups=groups).apply(
        params, _nhwc(x), jnp.asarray(temb.numpy()))
    np.testing.assert_allclose(np.asarray(ours), _from_nchw_ref(ref),
                               atol=3e-5)


def test_resnet_block_parity_no_temb_same_channels():
    cin, groups = 32, 8
    tmod = tref.ResnetBlock2D(cin, cin, None, groups, eps=1e-6).eval()
    params = {"params": convert_state_dict(tmod.state_dict())}
    x = torch.randn(1, cin, 6, 6)
    with torch.no_grad():
        ref = tmod(x)
    ours = ResnetBlock2D(cin, use_time_emb=False, groups=groups,
                         eps=1e-6).apply(params, _nhwc(x), None)
    np.testing.assert_allclose(np.asarray(ours), _from_nchw_ref(ref),
                               atol=3e-5)


def test_transformer2d_parity():
    """Transformer2DModel: GroupNorm -> linear proj -> self+cross blocks
    (GEGLU feed-forward) -> proj out + residual."""
    c, heads, depth, cross, groups = 32, 4, 2, 48, 8
    tmod = tref.Transformer2DModel(c, heads, c // heads, depth, cross,
                                   groups).eval()
    params = {"params": convert_state_dict(tmod.state_dict())}

    x = torch.randn(2, c, 4, 6)
    ctx = torch.randn(2, 11, cross)
    with torch.no_grad():
        ref = tmod(x, ctx)
    ours = Transformer2DModel(
        c, heads, c // heads, depth, cross, norm_num_groups=groups,
    ).apply(params, _nhwc(x), jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(ours), _from_nchw_ref(ref),
                               atol=5e-5)


def test_vae_autoencoder_parity():
    """Full AutoencoderKL: encode moments and decode, torch vs flax through
    `convert_vae` (structure per diffusers AutoencoderKL, used at
    `/root/reference/FaithDiff/create_FaithDiff_model.py:13`)."""
    cfg = tiny_vae_config()
    tmod = tref.AutoencoderKL(cfg.block_out_channels, cfg.layers_per_block,
                              cfg.latent_channels, cfg.norm_num_groups).eval()
    params = {"params": convert_vae(tmod.state_dict())}
    vae = AutoencoderKL(config=cfg)

    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref_m = tmod.encode_moments(x)
    ours_m = vae.apply(params, _nhwc(x), method=AutoencoderKL.encode_moments)
    np.testing.assert_allclose(np.asarray(ours_m), _from_nchw_ref(ref_m),
                               atol=5e-5)

    z = torch.randn(1, cfg.latent_channels, 4, 4)
    with torch.no_grad():
        ref_d = tmod.decode(z)
    ours_d = vae.apply(params, _nhwc(z), method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(ours_d), _from_nchw_ref(ref_d),
                               atol=5e-5)


def test_denoise_encoder_parity():
    """Headless VAE encoder (the FaithDiff denoise_encoder,
    `unet_2d_condition_vae_extension.py:39-196`): stops at the mid block."""
    tmod = tref.Encoder((16, 32, 64, 64), 2, groups=8, with_head=False).eval()
    params = {"params": convert_denoise_encoder(tmod.state_dict())}
    from faithdiff_tpu.config import tiny_denoise_encoder_config

    de = DenoiseEncoder(config=tiny_denoise_encoder_config())
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = tmod(x)
    ours = de.apply(params, _nhwc(x))
    np.testing.assert_allclose(np.asarray(ours), _from_nchw_ref(ref),
                               atol=5e-5)


def _randomize_zero_init(tmod: tref.FaithDiffUNet):
    """The fusion output layers are zero-init; randomize them so parity
    actually exercises the fusion path end-to-end."""
    with torch.no_grad():
        for p in (tmod.spatial_ch_projs.weight, tmod.spatial_ch_projs.bias,
                  tmod.condition_embedding.conv_out.weight,
                  tmod.condition_embedding.conv_out.bias):
            p.copy_(torch.randn_like(p) * 0.1)


def test_full_tiny_unet_parity():
    """Full UNet forward (time/add embeddings, fusion, down/mid/up, out head)
    vs the torch twin through `convert_unet` — the strongest checkpoint-free
    parity gate for SDXL weight porting."""
    cfg = tiny_unet_config()
    tmod = tref.FaithDiffUNet(cfg).eval()
    _randomize_zero_init(tmod)
    params = {"params": convert_unet(tmod.state_dict())}
    model = UNet2DConditionModel(config=cfg)

    b, s = 2, 16
    sample = torch.randn(b, cfg.in_channels, s, s)
    t = torch.tensor([500.0, 20.0])
    ctx = torch.randn(b, 77, cfg.cross_attention_dim)
    pooled = torch.randn(b, 64)
    time_ids = torch.tensor([[512., 512., 0., 0., 512., 512.]] * b)
    cond = torch.randn(b, cfg.condition_channels, s, s)

    with torch.no_grad():
        ref = tmod(sample, t, ctx, pooled, time_ids, cond)
    ours = model.apply(
        params, _nhwc(sample), jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()), jnp.asarray(pooled.numpy()),
        jnp.asarray(time_ids.numpy()), _nhwc(cond))
    np.testing.assert_allclose(np.asarray(ours), _from_nchw_ref(ref),
                               atol=2e-4)


def test_full_tiny_unet_parity_replace_mode():
    """`add_sample=False` replaces the post-conv_in features with the fusion
    output instead of adding (`unet_2d_condition_vae_extension.py:570-579`)."""
    cfg = tiny_unet_config()
    tmod = tref.FaithDiffUNet(cfg).eval()
    _randomize_zero_init(tmod)
    params = {"params": convert_unet(tmod.state_dict())}
    model = UNet2DConditionModel(config=cfg)

    b, s = 2, 8
    sample = torch.randn(b, cfg.in_channels, s, s)
    t = torch.tensor([999.0, 999.0])
    ctx = torch.randn(b, 77, cfg.cross_attention_dim)
    pooled = torch.randn(b, 64)
    time_ids = torch.zeros(b, 6)
    cond = torch.randn(b, cfg.condition_channels, s, s)

    with torch.no_grad():
        ref = tmod(sample, t, ctx, pooled, time_ids, cond, add_sample=False)
    ours = model.apply(
        params, _nhwc(sample), jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()), jnp.asarray(pooled.numpy()),
        jnp.asarray(time_ids.numpy()), _nhwc(cond), add_sample=False)
    np.testing.assert_allclose(np.asarray(ours), _from_nchw_ref(ref),
                               atol=2e-4)
