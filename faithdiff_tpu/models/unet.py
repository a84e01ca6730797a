"""SDXL UNet with the FaithDiff LQ-feature fusion path.

Capability-equivalent to the reference extended UNet
(`/root/reference/FaithDiff/models/unet_2d_condition_vae_extension.py:269-697`):
- standard SDXL 2.6B UNet (320/640/1280 channels, transformer depths
  [1, 2, 10], text_time additional embeddings)
- fusion after `conv_in`: condition embedding over denoise_encoder features,
  concat -> information transformer -> zero-init projection -> residual add
  (`:570-579`; `add_sample=False` replaces instead of adds)

TPU-first: flax.linen module, NHWC, bf16 compute / fp32 params, attention via
Pallas flash kernels, no Python control flow on traced values.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import UNetConfig
from .adapters import ConditionEmbedding, InformationTransformer
from .layers import GroupNorm, TimestepEmbedding, get_timestep_embedding
from .unet_blocks import (CrossAttnDownBlock2D, CrossAttnUpBlock2D,
                          DownBlock2D, UNetMidBlock2DCrossAttn, UpBlock2D)

Dtype = Any


class UNet2DConditionModel(nn.Module):
    """SDXL denoising UNet with optional FaithDiff extension slots."""

    config: UNetConfig = UNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,                  # [B, H, W, 4] noisy latents
        timestep: jax.Array,                # scalar or [B]
        encoder_hidden_states: jax.Array,   # [B, 77*n, 2048] text states
        added_text_embeds: jax.Array,       # [B, 1280] pooled text embeds
        added_time_ids: jax.Array,          # [B, 6] SDXL micro-conditioning
        input_embedding: Optional[jax.Array] = None,  # [B, H, W, 512] LQ feats
        add_sample: bool = True,
        use_condition_embedding: bool = True,
        fusion_group_size: Optional[int] = None,
    ) -> jax.Array:
        cfg = self.config
        act = jax.nn.silu

        # 1. time + added conditioning embeddings
        if timestep.ndim == 0:
            timestep = jnp.broadcast_to(timestep, (sample.shape[0],))
        t_emb = get_timestep_embedding(
            timestep, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb)

        if cfg.addition_embed_type == "text_time":
            b = added_time_ids.shape[0]
            time_ids_flat = added_time_ids.reshape(-1)
            time_embeds = get_timestep_embedding(
                time_ids_flat, cfg.addition_time_embed_dim,
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                downscale_freq_shift=cfg.freq_shift,
            ).reshape(b, -1)
            add_embeds = jnp.concatenate(
                [added_text_embeds.astype(jnp.float32), time_embeds], axis=-1
            ).astype(self.dtype)
            aug_emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                        name="add_embedding")(add_embeds)
            emb = emb + aug_emb

        context = encoder_hidden_states.astype(self.dtype)

        # 2. conv_in + FaithDiff fusion
        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="conv_in")(sample.astype(self.dtype))
        if cfg.with_faithdiff_extension and input_embedding is not None:
            cond = input_embedding.astype(self.dtype)
            if use_condition_embedding:
                cond = ConditionEmbedding(
                    cfg.block_out_channels[0], dtype=self.dtype,
                    name="condition_embedding",
                )(cond)
            # under remat, checkpoint the fusion transformer too — its
            # backward attention temps showed in the stage-2 v5e AOT
            # top-buffer list (160 MB-class dot_general transposes)
            _Info = (nn.remat(InformationTransformer, static_argnums=(3,))
                     if cfg.remat else InformationTransformer)
            feat_alpha = _Info(
                num_layers=cfg.info_transformer_layers,
                d_model=cfg.info_transformer_dim,
                n_head=cfg.info_transformer_heads,
                out_channels=cfg.block_out_channels[0],
                dtype=self.dtype,
                name="information_transformer",
            )(sample, cond, fusion_group_size)
            sample = sample + feat_alpha if add_sample else feat_alpha

        # block classes, optionally rematerialised (trade FLOPs for HBM in
        # the backward pass — jax.checkpoint at block granularity)
        if cfg.remat:
            _Down = nn.remat(DownBlock2D)
            _CrossDown = nn.remat(CrossAttnDownBlock2D)
            _Mid = nn.remat(UNetMidBlock2DCrossAttn)
            _Up = nn.remat(UpBlock2D, static_argnums=(4,))
            _CrossUp = nn.remat(CrossAttnUpBlock2D, static_argnums=(5,))
        else:
            _Down, _CrossDown = DownBlock2D, CrossAttnDownBlock2D
            _Mid, _Up, _CrossUp = (UNetMidBlock2DCrossAttn, UpBlock2D,
                                   CrossAttnUpBlock2D)

        # 3. down blocks
        down_res: Tuple[jax.Array, ...] = (sample,)
        n_blocks = len(cfg.down_block_types)
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == n_blocks - 1
            if block_type == "CrossAttnDownBlock2D":
                sample, res = _CrossDown(
                    out_ch, num_layers=cfg.layers_per_block,
                    transformer_depth=cfg.transformer_layers_per_block[i],
                    # diffusers SDXL quirk: `attention_head_dim` in the config
                    # is actually the head COUNT ([5, 10, 20] -> dim 64 each)
                    heads=cfg.attention_head_dim[i],
                    cross_attention_dim=cfg.cross_attention_dim,
                    add_downsample=not is_final,
                    groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    upcast_attention=cfg.upcast_attention, dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(sample, emb, context)
            else:
                sample, res = _Down(
                    out_ch, num_layers=cfg.layers_per_block,
                    add_downsample=not is_final,
                    groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, name=f"down_blocks_{i}",
                )(sample, emb)
            down_res = down_res + res

        # 4. mid block
        sample = _Mid(
            cfg.block_out_channels[-1],
            transformer_depth=cfg.transformer_layers_per_block[-1],
            heads=cfg.attention_head_dim[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            upcast_attention=cfg.upcast_attention, dtype=self.dtype,
            name="mid_block",
        )(sample, emb, context)

        # 5. up blocks
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            is_final = i == len(cfg.up_block_types) - 1
            num_layers = cfg.layers_per_block + 1
            res = down_res[-num_layers:]
            down_res = down_res[:-num_layers]
            upsample_size = down_res[-1].shape[1:3] if down_res else None
            rev_idx = n_blocks - 1 - i
            if block_type == "CrossAttnUpBlock2D":
                sample = _CrossUp(
                    out_ch, num_layers=num_layers,
                    transformer_depth=cfg.transformer_layers_per_block[rev_idx],
                    heads=cfg.attention_head_dim[rev_idx],
                    cross_attention_dim=cfg.cross_attention_dim,
                    add_upsample=not is_final,
                    groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    upcast_attention=cfg.upcast_attention, dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(sample, res, emb, context, upsample_size)
            else:
                sample = _Up(
                    out_ch, num_layers=num_layers, add_upsample=not is_final,
                    groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                    dtype=self.dtype, name=f"up_blocks_{i}",
                )(sample, res, emb, upsample_size)

        # 6. out head
        sample = GroupNorm(cfg.norm_num_groups, cfg.norm_eps,
                           name="conv_norm_out")(sample)
        sample = act(sample)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                         param_dtype=jnp.float32, name="conv_out")(sample)
        return sample
