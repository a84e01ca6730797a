"""Dataclass configuration system.

Replaces the reference's argparse sprawl (`/root/reference/train_SDXL_stage_1.py:200-545`)
and hardcoded model-construction kwargs with typed, hashable config objects that can be
passed through jit as static arguments.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SDXL UNet configuration.

    Defaults mirror stabilityai/stable-diffusion-xl-base-1.0 `unet/config.json`,
    which is what the reference extends
    (`/root/reference/FaithDiff/models/unet_2d_condition_vae_extension.py:269-387`).
    """

    sample_size: int = 128
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "UpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 2, 10)
    attention_head_dim: Tuple[int, ...] = (5, 10, 20)
    cross_attention_dim: int = 2048
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    act_fn: str = "silu"
    addition_embed_type: str = "text_time"
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    use_linear_projection: bool = True
    upcast_attention: bool = False
    # FaithDiff extension slots
    # (`unet_2d_condition_vae_extension.py:382-401`)
    with_faithdiff_extension: bool = True
    condition_channels: int = 512           # denoise_encoder output channels
    # rematerialise each UNet block in the backward pass (the reference's
    # gradient checkpointing, `unet_2d_condition_vae_extension.py:125-143`)
    remat: bool = False
    info_transformer_layers: int = 2
    info_transformer_dim: int = 640         # 2 * block_out_channels[0]
    info_transformer_heads: int = 8

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """SDXL AutoencoderKL config (madebyollin/sdxl-vae-fp16-fix layout)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    act_fn: str = "silu"
    scaling_factor: float = 0.13025
    force_upcast: bool = False  # fp16-fix VAE does not need fp32 upcast
    sample_size: int = 1024
    # Tiling knobs (reference: `unet_2d_condition_vae_extension.py:70-73`)
    tile_sample_min_size: int = 1024
    tile_overlap_factor: float = 0.25

    @property
    def tile_latent_min_size(self) -> int:
        return self.tile_sample_min_size // 8


@dataclasses.dataclass(frozen=True)
class DenoiseEncoderConfig:
    """FaithDiff LQ-feature extractor: a VAE-encoder-shaped CNN without the
    final norm/act/conv head (`unet_2d_condition_vae_extension.py:39-196`).
    """

    in_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    act_fn: str = "silu"
    mid_block_add_attention: bool = True
    # gradient checkpointing for training (the reference Encoder's
    # grad-ckpt path, `unet_2d_condition_vae_extension.py:125-143`)
    remat: bool = False
    tile_sample_min_size: int = 1024
    tile_overlap_factor: float = 0.25

    @property
    def out_channels(self) -> int:
        return self.block_out_channels[-1]

    @property
    def tile_latent_min_size(self) -> int:
        return self.tile_sample_min_size // 8


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """Config for one CLIP text tower."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: Optional[int] = None  # set for text_encoder_2 (bigG)

    @staticmethod
    def sdxl_text_encoder() -> "CLIPTextConfig":
        """openai/clip-vit-large-patch14 text tower (SDXL text_encoder)."""
        return CLIPTextConfig()

    @staticmethod
    def sdxl_text_encoder_2() -> "CLIPTextConfig":
        """laion/CLIP-ViT-bigG-14 text tower (SDXL text_encoder_2)."""
        return CLIPTextConfig(
            hidden_size=1280,
            intermediate_size=5120,
            num_hidden_layers=32,
            num_attention_heads=20,
            hidden_act="gelu",
            projection_dim=1280,
        )


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Shared diffusion-process parameters (SDXL scheduler config)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    timestep_spacing: str = "leading"
    steps_offset: int = 1
    prediction_type: str = "epsilon"
    # EulerDiscrete extras
    interpolation_type: str = "linear"
    use_karras_sigmas: bool = False
    # DDPM extras
    variance_type: str = "fixed_small"
    clip_sample: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Inference configuration, mirroring the reference CLI flags
    (`/root/reference/test.py:29-49`)."""

    num_inference_steps: int = 20
    guidance_scale: float = 5.0
    guidance_rescale: float = 0.0
    tile_size: int = 1024           # pixel-space tile edge (latent = /8)
    tile_overlap: float = 0.5
    start_point: str = "lr"         # "lr" | "noise"
    add_sample: bool = True
    color_fix: str = "wavelet"      # "wavelet" | "adain" | "nofix"
    use_tiled_vae: bool = False
    dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Two-stage training recipe (`train_stage_1.sh`, `train_stage_2.sh`)."""

    resolution: int = 512
    batch_size_per_device: int = 16
    # micro-batch gradient accumulation (the reference's accelerate
    # `gradient_accumulation_steps: 4`, `accelerate_config.yaml:9`).
    # 1 = every step is an optimizer step. The stage-2 runner defaults to
    # batch 2/dev x accum 16 on v5e-8 — the measured memory-fit plan (the
    # only configuration the real v5e compiler PASSED; PERFORMANCE.md
    # stage-2 table) preserving the reference's effective 256 (16 x 4 x 4).
    grad_accum: int = 1
    learning_rate: float = 5e-5
    vis_learning_rate: float = 5e-6  # stage-2 denoise_encoder LR
    lr_scheduler: str = "cosine"
    lr_warmup_steps: int = 300
    max_train_steps: int = 6000
    noise_offset: float = 0.02
    max_grad_norm: float = 1.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    ema_decay: float = 0.9999
    ema_update_interval: int = 100
    checkpointing_steps: int = 2000
    checkpoints_total_limit: int = 5
    validation_steps: int = 500
    caption_dropout: float = 0.2
    stage: int = 1
    seed: int = 42


def sdxl_unet_config() -> UNetConfig:
    return UNetConfig()


def tiny_unet_config() -> UNetConfig:
    """Small config for unit tests: same topology, tiny dims."""
    return UNetConfig(
        sample_size=16,
        block_out_channels=(32, 64, 128),
        transformer_layers_per_block=(1, 1, 2),
        attention_head_dim=(4, 8, 16),
        cross_attention_dim=64,
        norm_num_groups=8,
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=8 * 6 + 64,
        condition_channels=64,
        info_transformer_dim=64,
        info_transformer_heads=4,
        info_transformer_layers=2,
    )


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(
        block_out_channels=(16, 32, 32, 32),
        norm_num_groups=8,
        tile_sample_min_size=64,
    )


def tiny_denoise_encoder_config() -> DenoiseEncoderConfig:
    return DenoiseEncoderConfig(
        block_out_channels=(16, 32, 64, 64),
        norm_num_groups=8,
        tile_sample_min_size=64,
    )
