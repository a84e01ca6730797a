"""SDXL AutoencoderKL and the FaithDiff denoise_encoder.

Capability-equivalent to diffusers `AutoencoderKL` (used at
`/root/reference/FaithDiff/create_FaithDiff_model.py:13`) and the reference's
headless VAE-encoder clone `Encoder`
(`/root/reference/FaithDiff/models/unet_2d_condition_vae_extension.py:39-196`),
including tiled encode/decode with linear seam blending (`:150-190`).

NHWC, fp32 norms, bf16-friendly convs.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DenoiseEncoderConfig, VAEConfig
from .layers import ACT2FN, GroupNorm
from .unet_blocks import DownEncoderBlock2D, UNetMidBlock2D, UpDecoderBlock2D

Dtype = Any


class Encoder(nn.Module):
    """VAE encoder trunk.

    `with_head=True` applies the final norm/act/conv (producing 2*latent
    moments); `with_head=False` reproduces the FaithDiff denoise_encoder,
    which stops at the mid-block output (512-ch features at 1/8 res)."""

    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    act_fn: str = "silu"
    double_z: bool = True
    with_head: bool = True
    mid_block_add_attention: bool = True
    # rematerialise each down/mid block in the backward pass — the
    # reference Encoder's gradient-checkpointing path
    # (`unet_2d_condition_vae_extension.py:125-143`). Stage-2 trains the
    # denoise_encoder, whose full-resolution activations dominate HBM
    # (measured: the v5e AOT memory analysis OOMs 109 GiB at batch 16/dev
    # res 512 without this)
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # down blocks checkpoint PER RESNET (see DownEncoderBlock2D.remat);
        # the mid block (1/8 res, small temps) remats as a whole
        _Mid = nn.remat(UNetMidBlock2D) if self.remat else UNetMidBlock2D
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_in")(x.astype(self.dtype))
        for i, out_ch in enumerate(self.block_out_channels):
            is_final = i == len(self.block_out_channels) - 1
            x = DownEncoderBlock2D(
                out_ch, num_layers=self.layers_per_block,
                add_downsample=not is_final, groups=self.norm_num_groups,
                remat=self.remat,
                dtype=self.dtype, name=f"down_blocks_{i}",
            )(x)
        x = _Mid(
            self.block_out_channels[-1],
            add_attention=self.mid_block_add_attention,
            groups=self.norm_num_groups, dtype=self.dtype, name="mid_block",
        )(x)
        if self.with_head:
            x = GroupNorm(self.norm_num_groups, 1e-6,
                          act=self.act_fn if self.act_fn == "silu" else None,
                          name="conv_norm_out")(x)
            if self.act_fn != "silu":
                x = ACT2FN[self.act_fn](x)
            out_ch = 2 * self.latent_channels if self.double_z else self.latent_channels
            x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    norm_num_groups: int = 32
    act_fn: str = "silu"
    mid_block_add_attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = nn.Conv(self.block_out_channels[-1], (3, 3), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_in")(z.astype(self.dtype))
        x = UNetMidBlock2D(
            self.block_out_channels[-1],
            add_attention=self.mid_block_add_attention,
            groups=self.norm_num_groups, dtype=self.dtype, name="mid_block",
        )(x)
        rev = list(reversed(self.block_out_channels))
        for i, out_ch in enumerate(rev):
            is_final = i == len(rev) - 1
            x = UpDecoderBlock2D(
                out_ch, num_layers=self.layers_per_block + 1,
                add_upsample=not is_final, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"up_blocks_{i}",
            )(x)
        x = GroupNorm(self.norm_num_groups, 1e-6,
                      act=self.act_fn if self.act_fn == "silu" else None,
                      name="conv_norm_out")(x)
        if self.act_fn != "silu":
            x = ACT2FN[self.act_fn](x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """Full KL autoencoder with quant convs; call via
    `apply(vars, x, method=AutoencoderKL.encode)` etc."""

    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            latent_channels=cfg.latent_channels,
            norm_num_groups=cfg.norm_num_groups,
            act_fn=cfg.act_fn, dtype=self.dtype,
        )
        self.decoder = Decoder(
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            out_channels=cfg.out_channels,
            norm_num_groups=cfg.norm_num_groups,
            act_fn=cfg.act_fn, dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * cfg.latent_channels, (1, 1),
                                  dtype=self.dtype, param_dtype=jnp.float32)
        self.post_quant_conv = nn.Conv(cfg.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       param_dtype=jnp.float32)

    def encode_moments(self, x: jax.Array) -> jax.Array:
        """[B, H, W, 3] image in [-1, 1] -> [B, H/8, W/8, 8] moments."""
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jax.Array) -> jax.Array:
        """[B, h, w, 4] (unscaled) latents -> [B, 8h, 8w, 3] in [-1, 1]."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array) -> jax.Array:
        moments = self.encode_moments(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        return self.decode(mean)


def sample_from_moments(
    moments: jax.Array, key: Optional[jax.Array] = None
) -> jax.Array:
    """DiagonalGaussianDistribution.sample(): mean + std * N(0,1).
    key=None -> mode (the mean)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if key is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    noise = jax.random.normal(key, mean.shape, jnp.float32)
    return (mean.astype(jnp.float32) + std * noise).astype(moments.dtype)


# ---------------------------------------------------------------------------
# Tiled application with linear seam blending
# (`unet_2d_condition_vae_extension.py:150-190`; diffusers VAE tiling)
# ---------------------------------------------------------------------------

def blend_v(a: jax.Array, b: jax.Array, extent: int) -> jax.Array:
    """Blend bottom `extent` rows of `a` into top rows of `b` (NHWC)."""
    extent = min(a.shape[1], b.shape[1], extent)
    if extent <= 0:
        return b
    ramp = (jnp.arange(extent, dtype=jnp.float32) / extent)[None, :, None, None]
    top = a[:, -extent:, :, :].astype(jnp.float32) * (1 - ramp) + \
        b[:, :extent, :, :].astype(jnp.float32) * ramp
    return jnp.concatenate([top.astype(b.dtype), b[:, extent:, :, :]], axis=1)


def blend_h(a: jax.Array, b: jax.Array, extent: int) -> jax.Array:
    """Blend right `extent` cols of `a` into left cols of `b` (NHWC)."""
    extent = min(a.shape[2], b.shape[2], extent)
    if extent <= 0:
        return b
    ramp = (jnp.arange(extent, dtype=jnp.float32) / extent)[None, None, :, None]
    left = a[:, :, -extent:, :].astype(jnp.float32) * (1 - ramp) + \
        b[:, :, :extent, :].astype(jnp.float32) * ramp
    return jnp.concatenate([left.astype(b.dtype), b[:, :, extent:, :]], axis=2)


def tiled_apply(
    fn,
    x: jax.Array,
    tile_in: int,
    overlap_factor: float,
    scale: float,
    batched_fn=None,
    batch: int = 0,
) -> jax.Array:
    """Apply `fn` (an image->feature map with resolution ratio `scale`) over
    overlapping spatial tiles of `x`, blending seams linearly.

    Mirrors `tiled_encode` (`unet_2d_condition_vae_extension.py:164-190`):
    stride `tile_in * (1 - overlap)`, output blend extent
    `tile_out * overlap`, rows/cols cropped to `tile_out - blend_extent` then
    concatenated. Works for encode (scale=1/8) and decode (scale=8).

    `batched_fn` ([G, th, tw, C] -> [G, oh, ow, C']) runs same-shape tiles
    as batched calls of `batch` tiles each (groups padded by repetition) —
    the tile-parallel path: on a mesh the batch axis carries a tile
    sharding so the VAE/denoise-encoder tail of an 8K run divides across
    chips like the denoise loop does. The per-tile math is unchanged
    (convs/GroupNorm are batch-independent); ragged edge tiles batch within
    their own shape group, so no tile is ever padded spatially.
    """
    overlap_size = int(tile_in * (1 - overlap_factor))
    tile_out = int(round(tile_in * scale))
    blend_extent = int(tile_out * overlap_factor)
    row_limit = tile_out - blend_extent

    h, w = x.shape[1], x.shape[2]
    if batched_fn is not None and batch > 0:
        rows = _tiled_apply_batched(batched_fn, x, tile_in, overlap_size,
                                    batch)
    else:
        rows = []
        for i in range(0, h, overlap_size):
            row = []
            for j in range(0, w, overlap_size):
                tile = x[:, i:i + tile_in, j:j + tile_in, :]
                row.append(fn(tile))
            rows.append(row)
    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = blend_v(rows[i - 1][j], tile, blend_extent)
            if j > 0:
                tile = blend_h(row[j - 1], tile, blend_extent)
            result_row.append(tile[:, :row_limit, :row_limit, :])
        result_rows.append(jnp.concatenate(result_row, axis=2))
    return jnp.concatenate(result_rows, axis=1)


def _tiled_apply_batched(batched_fn, x: jax.Array, tile_in: int,
                         overlap_size: int, batch: int):
    """Run the tile grid through `batched_fn` in same-shape groups of
    `batch` tiles, preserving `tiled_apply`'s row/column structure for the
    blend pass. Groups are padded by repeating their first tiles; padded
    outputs are dropped."""
    h, w = x.shape[1], x.shape[2]
    grid = []                       # [(row_idx, col_idx, tile)]
    for i in range(0, h, overlap_size):
        for j in range(0, w, overlap_size):
            grid.append((i // overlap_size, j // overlap_size,
                         x[:, i:i + tile_in, j:j + tile_in, :]))
    n_rows = grid[-1][0] + 1
    n_cols = grid[-1][1] + 1

    groups: dict = {}
    for k, (_, _, tile) in enumerate(grid):
        groups.setdefault(tile.shape[1:3], []).append(k)

    out: dict = {}
    for idxs in groups.values():
        padded = idxs + idxs[:(-len(idxs)) % batch]  # pad by repetition
        for s in range(0, len(padded), batch):
            sel = padded[s:s + batch]
            # stack ONE batch at a time: a whole-group stack is ~GBs of
            # full-resolution tiles at 8K
            res = batched_fn(
                jnp.concatenate([grid[k][2] for k in sel], axis=0))
            for n, k in enumerate(sel):
                if k not in out:
                    out[k] = res[n][None]

    return [[out[r * n_cols + c] for c in range(n_cols)]
            for r in range(n_rows)]


class DenoiseEncoder(nn.Module):
    """FaithDiff LQ-feature extractor: headless VAE encoder
    (`unet_2d_condition_vae_extension.py:39-196`)."""

    config: DenoiseEncoderConfig = DenoiseEncoderConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        return Encoder(
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            norm_num_groups=cfg.norm_num_groups,
            act_fn=cfg.act_fn, with_head=False,
            mid_block_add_attention=cfg.mid_block_add_attention,
            remat=cfg.remat,
            dtype=self.dtype, name="encoder",
        )(x)
