"""Torch test-fixtures implementing the SDXL block math the reference model
tree is built from.

The reference (`/root/reference/FaithDiff/models/unet_2d_condition_vae_extension.py`)
composes diffusers classes (`ResnetBlock2D`, `Transformer2DModel`,
`DownEncoderBlock2D`, `UNetMidBlock2D`, ...). diffusers is not installable in
this environment, so these modules re-derive that math in plain torch with
diffusers state-dict naming. They exist ONLY to feed `utils/convert.py` and
assert numerical parity of the flax models — the checkpoint-free defense of
the "bit-comparable latents" north star (VERDICT.md round 1, item 2).

All modules run fp32, eval-mode, no dropout.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(
    timesteps: torch.Tensor,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> torch.Tensor:
    """diffusers `get_timestep_embedding` semantics (fp32)."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = torch.exp(exponent)[None, :] * timesteps.float()[:, None]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, time_embed_dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    """norm1→silu→conv1 (+temb proj) →norm2→silu→conv2, residual w/
    optional 1x1 shortcut."""

    def __init__(self, cin: int, cout: int, temb_dim: int | None = None,
                 groups: int = 32, eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        shortcut = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return shortcut + h


class Attention(nn.Module):
    """Softmax attention, separate q/k/v (no bias), `to_out.0` Linear."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 cross_dim: int | None = None, qkv_bias: bool = False):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(dim, inner, bias=qkv_bias)
        self.to_k = nn.Linear(cross_dim or dim, inner, bias=qkv_bias)
        self.to_v = nn.Linear(cross_dim or dim, inner, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, sq, _ = x.shape
        sk = context.shape[1]

        def split(t, s):
            return t.view(b, s, self.heads, self.dim_head).transpose(1, 2)

        q = split(self.to_q(x), sq)
        k = split(self.to_k(context), sk)
        v = split(self.to_v(context), sk)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(self.dim_head), -1)
        out = (attn @ v).transpose(1, 2).reshape(b, sq, -1)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim: int, dim_out: int):
        super().__init__()
        self.proj = nn.Linear(dim, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Identity(),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, dim_head: int, cross_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head, cross_dim=cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    """Linear-projection variant (SDXL `use_linear_projection=True`)."""

    def __init__(self, channels: int, heads: int, dim_head: int, depth: int,
                 cross_dim: int, groups: int = 32):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Linear(channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, dim_head, cross_dim)
             for _ in range(depth)])
        self.proj_out = nn.Linear(inner, channels)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        hidden = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        hidden = self.proj_in(hidden)
        for blk in self.transformer_blocks:
            hidden = blk(hidden, context)
        hidden = self.proj_out(hidden)
        return hidden.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class Downsample2D(nn.Module):
    def __init__(self, cin: int, cout: int, vae_pad: bool = False):
        super().__init__()
        self.vae_pad = vae_pad
        self.conv = nn.Conv2d(cin, cout, 3, stride=2,
                              padding=0 if vae_pad else 1)

    def forward(self, x):
        if self.vae_pad:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, padding=1)

    def forward(self, x, output_size=None):
        if output_size is None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
        else:
            x = F.interpolate(x, size=output_size, mode="nearest")
        return self.conv(x)


# ---------------------------------------------------------------------------
# UNet blocks
# ---------------------------------------------------------------------------

class DownBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim, num_layers=2, add_downsample=True,
                 groups=32, eps=1e-5):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(cin if i == 0 else cout, cout, temb_dim, groups, eps)
            for i in range(num_layers)])
        if add_downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(cout, cout)])

    def forward(self, x, temb):
        res = []
        for r in self.resnets:
            x = r(x, temb)
            res.append(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
            res.append(x)
        return x, res


class CrossAttnDownBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim, heads, depth, cross_dim,
                 num_layers=2, add_downsample=True, groups=32, eps=1e-5):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(cin if i == 0 else cout, cout, temb_dim, groups, eps)
            for i in range(num_layers)])
        self.attentions = nn.ModuleList([
            Transformer2DModel(cout, heads, cout // heads, depth, cross_dim,
                               groups)
            for _ in range(num_layers)])
        if add_downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(cout, cout)])

    def forward(self, x, temb, context):
        res = []
        for r, a in zip(self.resnets, self.attentions):
            x = a(r(x, temb), context)
            res.append(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
            res.append(x)
        return x, res


class UNetMidBlock2DCrossAttn(nn.Module):
    def __init__(self, channels, temb_dim, heads, depth, cross_dim,
                 groups=32, eps=1e-5):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(channels, channels, temb_dim, groups, eps),
            ResnetBlock2D(channels, channels, temb_dim, groups, eps)])
        self.attentions = nn.ModuleList([
            Transformer2DModel(channels, heads, channels // heads, depth,
                               cross_dim, groups)])

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        return self.resnets[1](x, temb)


class UpBlock2D(nn.Module):
    def __init__(self, cin, cprev, cout, temb_dim, num_layers=3,
                 add_upsample=True, groups=32, eps=1e-5):
        """`cin`: skip-channel list handled by caller via res tuple; resnet i
        input = current channels + skip channels."""
        super().__init__()
        self.resnets = nn.ModuleList()
        for i in range(num_layers):
            in_ch = (cprev if i == 0 else cout) + cin[i]
            self.resnets.append(ResnetBlock2D(in_ch, cout, temb_dim, groups, eps))
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(cout, cout)])

    def forward(self, x, res_list, temb, upsample_size=None):
        for r in self.resnets:
            skip = res_list.pop()
            x = r(torch.cat([x, skip], dim=1), temb)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x, upsample_size)
        return x


class CrossAttnUpBlock2D(nn.Module):
    def __init__(self, cin, cprev, cout, temb_dim, heads, depth, cross_dim,
                 num_layers=3, add_upsample=True, groups=32, eps=1e-5):
        super().__init__()
        self.resnets = nn.ModuleList()
        for i in range(num_layers):
            in_ch = (cprev if i == 0 else cout) + cin[i]
            self.resnets.append(ResnetBlock2D(in_ch, cout, temb_dim, groups, eps))
        self.attentions = nn.ModuleList([
            Transformer2DModel(cout, heads, cout // heads, depth, cross_dim,
                               groups)
            for _ in range(num_layers)])
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(cout, cout)])

    def forward(self, x, res_list, temb, context, upsample_size=None):
        for r, a in zip(self.resnets, self.attentions):
            skip = res_list.pop()
            x = a(r(torch.cat([x, skip], dim=1), temb), context)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x, upsample_size)
        return x


# ---------------------------------------------------------------------------
# VAE blocks
# ---------------------------------------------------------------------------

class DownEncoderBlock2D(nn.Module):
    def __init__(self, cin, cout, num_layers=2, add_downsample=True,
                 groups=32, eps=1e-6):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(cin if i == 0 else cout, cout, None, groups, eps)
            for i in range(num_layers)])
        if add_downsample:
            self.downsamplers = nn.ModuleList(
                [Downsample2D(cout, cout, vae_pad=True)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
        return x


class UpDecoderBlock2D(nn.Module):
    def __init__(self, cin, cout, num_layers=3, add_upsample=True,
                 groups=32, eps=1e-6):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(cin if i == 0 else cout, cout, None, groups, eps)
            for i in range(num_layers)])
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(cout, cout)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class VaeAttention(nn.Module):
    """Single-head biased-projection spatial self-attention with residual."""

    def __init__(self, channels, groups=32, eps=1e-6):
        super().__init__()
        self.channels = channels
        self.group_norm = nn.GroupNorm(groups, channels, eps=eps)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        hidden = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(hidden), self.to_k(hidden), self.to_v(hidden)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), -1)
        out = self.to_out[0](attn @ v)
        out = out.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return out + residual


class UNetMidBlock2D(nn.Module):
    def __init__(self, channels, groups=32, eps=1e-6, add_attention=True):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(channels, channels, None, groups, eps),
            ResnetBlock2D(channels, channels, None, groups, eps)])
        if add_attention:
            self.attentions = nn.ModuleList(
                [VaeAttention(channels, groups, eps)])

    def forward(self, x):
        x = self.resnets[0](x)
        if hasattr(self, "attentions"):
            x = self.attentions[0](x)
        return self.resnets[1](x)


class Encoder(nn.Module):
    def __init__(self, block_out_channels=(16, 32, 32, 32), layers_per_block=2,
                 latent_channels=4, groups=32, in_channels=3, with_head=True,
                 mid_attention=True):
        super().__init__()
        self.with_head = with_head
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3,
                                 padding=1)
        self.down_blocks = nn.ModuleList()
        cin = block_out_channels[0]
        for i, cout in enumerate(block_out_channels):
            final = i == len(block_out_channels) - 1
            self.down_blocks.append(DownEncoderBlock2D(
                cin, cout, layers_per_block, add_downsample=not final,
                groups=groups))
            cin = cout
        self.mid_block = UNetMidBlock2D(cin, groups,
                                        add_attention=mid_attention)
        if with_head:
            self.conv_norm_out = nn.GroupNorm(groups, cin, eps=1e-6)
            self.conv_out = nn.Conv2d(cin, 2 * latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        if self.with_head:
            x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x


class Decoder(nn.Module):
    def __init__(self, block_out_channels=(16, 32, 32, 32), layers_per_block=2,
                 latent_channels=4, out_channels=3, groups=32):
        super().__init__()
        rev = list(reversed(block_out_channels))
        self.conv_in = nn.Conv2d(latent_channels, rev[0], 3, padding=1)
        self.mid_block = UNetMidBlock2D(rev[0], groups)
        self.up_blocks = nn.ModuleList()
        cin = rev[0]
        for i, cout in enumerate(rev):
            final = i == len(rev) - 1
            self.up_blocks.append(UpDecoderBlock2D(
                cin, cout, layers_per_block + 1, add_upsample=not final,
                groups=groups))
            cin = cout
        self.conv_norm_out = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv_out = nn.Conv2d(cin, out_channels, 3, padding=1)

    def forward(self, z):
        x = self.mid_block(self.conv_in(z))
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKL(nn.Module):
    def __init__(self, block_out_channels=(16, 32, 32, 32), layers_per_block=2,
                 latent_channels=4, groups=32):
        super().__init__()
        self.encoder = Encoder(block_out_channels, layers_per_block,
                               latent_channels, groups)
        self.decoder = Decoder(block_out_channels, layers_per_block,
                               latent_channels, groups=groups)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


# ---------------------------------------------------------------------------
# FaithDiff fusion adapters (reference math:
# `unet_2d_condition_vae_extension.py:199-260,570-579`)
# ---------------------------------------------------------------------------

class ConditionEmbedding(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm_in = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv_in = nn.Conv2d(cin, cin, 3, padding=1)
        self.conv_out = nn.Conv2d(cin, cout, 3, padding=1)
        nn.init.zeros_(self.conv_out.weight)
        nn.init.zeros_(self.conv_out.bias)

    def forward(self, x):
        return self.conv_out(F.silu(self.conv_in(self.norm_in(x))))


class InfoTransformerLayer(nn.Module):
    """Pre-LN MHA (packed qkv, sequence-first) + QuickGELU MLP."""

    def __init__(self, d_model, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(d_model, heads)
        self.ln_1 = nn.LayerNorm(d_model)
        self.mlp = nn.ModuleDict({
            "c_fc": nn.Linear(d_model, d_model * 2),
            "c_proj": nn.Linear(d_model * 2, d_model)})
        self.ln_2 = nn.LayerNorm(d_model)

    def forward(self, x):  # x: [seq, batch, d]
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        h = self.mlp["c_fc"](self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)
        return x + self.mlp["c_proj"](h)


class FaithDiffUNet(nn.Module):
    """Tiny-config torch twin of `faithdiff_tpu.models.unet.UNet2DConditionModel`
    (fusion path per `unet_2d_condition_vae_extension.py:480-697`)."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        temb_dim = cfg.time_embed_dim
        self.cfg = cfg
        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch[0], temb_dim)
        self.add_embedding = TimestepEmbedding(
            cfg.projection_class_embeddings_input_dim, temb_dim)

        self.condition_embedding = ConditionEmbedding(
            cfg.condition_channels, ch[0])
        self.information_transformer_layes = nn.ModuleList([
            InfoTransformerLayer(cfg.info_transformer_dim,
                                 cfg.info_transformer_heads)
            for _ in range(cfg.info_transformer_layers)])
        self.spatial_ch_projs = nn.Linear(cfg.info_transformer_dim, ch[0])
        nn.init.zeros_(self.spatial_ch_projs.weight)
        nn.init.zeros_(self.spatial_ch_projs.bias)

        g, eps, xd = cfg.norm_num_groups, cfg.norm_eps, cfg.cross_attention_dim
        self.down_blocks = nn.ModuleList()
        cin = ch[0]
        for i, btype in enumerate(cfg.down_block_types):
            cout = ch[i]
            final = i == len(cfg.down_block_types) - 1
            if btype == "CrossAttnDownBlock2D":
                blk = CrossAttnDownBlock2D(
                    cin, cout, temb_dim, cfg.attention_head_dim[i],
                    cfg.transformer_layers_per_block[i], xd,
                    cfg.layers_per_block, not final, g, eps)
            else:
                blk = DownBlock2D(cin, cout, temb_dim, cfg.layers_per_block,
                                  not final, g, eps)
            self.down_blocks.append(blk)
            cin = cout

        self.mid_block = UNetMidBlock2DCrossAttn(
            ch[-1], temb_dim, cfg.attention_head_dim[-1],
            cfg.transformer_layers_per_block[-1], xd, g, eps)

        # skip channels per up block (reversed down-block outputs)
        rev = list(reversed(ch))
        n = len(ch)
        self.up_blocks = nn.ModuleList()
        cprev = ch[-1]
        for i, btype in enumerate(cfg.up_block_types):
            cout = rev[i]
            final = i == len(cfg.up_block_types) - 1
            # skip-channel schedule: layers_per_block+1 skips; the deepest
            # skip of block i has the channel count of the next-shallower
            # down block (or ch[0] for the last)
            skips = [rev[i]] * cfg.layers_per_block + \
                [rev[i + 1] if i + 1 < n else ch[0]]
            if btype == "CrossAttnUpBlock2D":
                rev_idx = n - 1 - i
                blk = CrossAttnUpBlock2D(
                    skips, cprev, cout, temb_dim,
                    cfg.attention_head_dim[rev_idx],
                    cfg.transformer_layers_per_block[rev_idx], xd,
                    cfg.layers_per_block + 1, not final, g, eps)
            else:
                blk = UpBlock2D(skips, cprev, cout, temb_dim,
                                cfg.layers_per_block + 1, not final, g, eps)
            self.up_blocks.append(blk)
            cprev = cout

        self.conv_norm_out = nn.GroupNorm(g, ch[0], eps=eps)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timestep, context, pooled, time_ids,
                input_embedding=None, add_sample=True):
        cfg = self.cfg
        t_emb = timestep_embedding(timestep, cfg.block_out_channels[0])
        emb = self.time_embedding(t_emb)
        time_embeds = timestep_embedding(
            time_ids.reshape(-1), cfg.addition_time_embed_dim)
        add_embeds = torch.cat(
            [pooled, time_embeds.reshape(pooled.shape[0], -1)], dim=-1)
        emb = emb + self.add_embedding(add_embeds)

        sample = self.conv_in(sample)
        if input_embedding is not None:
            cond = self.condition_embedding(input_embedding)
            b, c, h, w = sample.shape
            # [b, hw, 2c] fed to seq-first MHA: seq axis = model batch,
            # attention batch = pixels (the reference's batch_first=False
            # quirk, `unet_2d_condition_vae_extension.py:570-579`)
            x = torch.cat([sample, cond], dim=1) \
                .view(b, 2 * c, h * w).transpose(1, 2)
            for layer in self.information_transformer_layes:
                x = layer(x)
            feat = self.spatial_ch_projs(x)  # [b, hw, c]
            feat_alpha = feat.transpose(1, 2).view(b, c, h, w)
            sample = sample + feat_alpha if add_sample else feat_alpha

        res_stack = [sample]
        for blk in self.down_blocks:
            if isinstance(blk, CrossAttnDownBlock2D):
                sample, res = blk(sample, emb, context)
            else:
                sample, res = blk(sample, emb)
            res_stack += res

        sample = self.mid_block(sample, emb, context)

        for blk in self.up_blocks:
            n_res = cfg.layers_per_block + 1
            res = res_stack[-n_res:]
            res_stack = res_stack[:-n_res]
            upsample_size = res_stack[-1].shape[2:] if res_stack else None
            if isinstance(blk, CrossAttnUpBlock2D):
                sample = blk(sample, list(res), emb, context, upsample_size)
            else:
                sample = blk(sample, list(res), emb, upsample_size)

        return self.conv_out(F.silu(self.conv_norm_out(sample)))


# ---------------------------------------------------------------------------
# Composed-pipeline transcription (reference `__call__` denoise loop,
# `pipeline_FaithDiff_tlc.py:1008-1459`): LocalAttention tiling, per-tile
# deep-copied scheduler state, CFG duplicate/combine, per-tile add_time_ids,
# Gaussian blend-merge. Used by tests/test_pipeline_composition_parity.py to
# check the JAX pipeline's composed latents, not just its modules.
# ---------------------------------------------------------------------------

import copy

import numpy as np


class TorchLocalAttention:
    """CPU transcription of `LocalAttention` (`pipeline_FaithDiff_tlc.py:
    101-283`): grids / _gaussian_weights (asymmetric midpoints) /
    grids_inverse."""

    def __init__(self, kernel_size, overlap=0.5):
        self.kernel_size = kernel_size
        self.overlap = overlap

    def grids(self, x):
        b, c, h, w = x.shape
        self.original_size = (b, c, h, w)
        assert b == 1
        k1, k2 = self.kernel_size
        k1, k2 = min(k1, h), min(k2, w)
        self.k1k2 = (k1, k2)
        self.tile_weights = self._gaussian_weights(k2, k1, c)
        num_row = (h - 1) // k1 + 1
        num_col = (w - 1) // k2 + 1
        step_j = k2 if num_col == 1 else math.ceil(k2 * self.overlap)
        step_i = k1 if num_row == 1 else math.ceil(k1 * self.overlap)
        parts, idxes = [], []
        i = 0
        last_i = False
        while i < h and not last_i:
            j = 0
            if i + k1 >= h:
                i = h - k1
                last_i = True
            last_j = False
            while j < w and not last_j:
                if j + k2 >= w:
                    j = w - k2
                    last_j = True
                parts.append(x[:, :, i:i + k1, j:j + k2])
                idxes.append({"i": i, "j": j})
                j = j + step_j
            i = i + step_i
        self.idxes = idxes
        return torch.cat(parts, dim=0)

    def _gaussian_weights(self, tile_width, tile_height, channels):
        var = 0.01
        midpoint = (tile_width - 1) / 2
        x_probs = [
            math.exp(-(x - midpoint) * (x - midpoint)
                     / (tile_width * tile_width) / (2 * var))
            / math.sqrt(2 * math.pi * var) for x in range(tile_width)]
        midpoint = tile_height / 2
        y_probs = [
            math.exp(-(y - midpoint) * (y - midpoint)
                     / (tile_height * tile_height) / (2 * var))
            / math.sqrt(2 * math.pi * var) for y in range(tile_height)]
        weights = np.outer(y_probs, x_probs)
        return torch.tile(torch.tensor(weights), (channels, 1, 1))

    def grids_inverse(self, outs):
        preds = torch.zeros(self.original_size, dtype=torch.float64)
        b, c, h, w = self.original_size
        count_mt = torch.zeros((b, c, h, w), dtype=torch.float64)
        k1, k2 = self.k1k2
        for cnt, each_idx in enumerate(self.idxes):
            i, j = each_idx["i"], each_idx["j"]
            preds[0, :, i:i + k1, j:j + k2] += \
                outs[cnt].double() * self.tile_weights
            count_mt[0, :, i:i + k1, j:j + k2] += self.tile_weights
        return (preds / count_mt).float()


class TorchEulerScheduler:
    """Transcription of diffusers `EulerDiscreteScheduler` (the SDXL default
    the reference loads, `create_FaithDiff_model.py:25-34`): scaled_linear
    betas, 'leading' spacing with steps_offset, interpolated sigmas, stateful
    `_step_index` — so the reference's per-tile `__dict__` deep-copy
    (`pipeline_FaithDiff_tlc.py:1282,1331,1375`) is exercised faithfully."""

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, steps_offset=1):
        betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5,
                               num_train_timesteps,
                               dtype=torch.float64) ** 2
        alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.sigmas_train = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
        self.num_train_timesteps = num_train_timesteps
        self.steps_offset = steps_offset
        self._step_index = None

    def set_timesteps(self, num_inference_steps):
        step_ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        ts = (ts + self.steps_offset).astype(np.float64)
        sigmas = np.interp(ts, np.arange(self.num_train_timesteps),
                           self.sigmas_train.numpy())
        sigmas = np.concatenate([sigmas, [0.0]])
        self.sigmas = torch.tensor(sigmas, dtype=torch.float32)
        self.timesteps = torch.tensor(ts, dtype=torch.float32)
        self.init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)
        self._step_index = None

    def _init_step_index(self, t):
        idx = (self.timesteps == t).nonzero()
        self._step_index = int(idx[0].item())

    def scale_model_input(self, sample, t):
        if self._step_index is None:
            self._init_step_index(t)
        sigma = self.sigmas[self._step_index]
        return sample / ((sigma ** 2 + 1) ** 0.5)

    def step(self, model_output, t, sample):
        if self._step_index is None:
            self._init_step_index(t)
        sigma = self.sigmas[self._step_index]
        pred_original = sample - sigma * model_output
        derivative = (sample - pred_original) / sigma
        dt = self.sigmas[self._step_index + 1] - sigma
        prev_sample = sample + derivative * dt
        self._step_index += 1
        return prev_sample


def rescale_noise_cfg_torch(noise_cfg, noise_pred_text, guidance_rescale):
    """`pipeline_FaithDiff_tlc.py:286-305`."""
    std_text = noise_pred_text.std(
        dim=list(range(1, noise_pred_text.ndim)), keepdim=True)
    std_cfg = noise_cfg.std(dim=list(range(1, noise_cfg.ndim)), keepdim=True)
    noise_pred_rescaled = noise_cfg * (std_text / std_cfg)
    return (guidance_rescale * noise_pred_rescaled
            + (1 - guidance_rescale) * noise_cfg)


@torch.no_grad()
def torch_faithdiff_denoise(
    unet, denoise_encoder, lr_img, prompt_embeds, pooled_embeds,
    num_inference_steps, guidance_scale, kernel_latent, overlap=0.5,
    guidance_rescale=0.0, add_sample=True, seed=0,
):
    """Latent-level transcription of the composed reference `__call__`
    (`pipeline_FaithDiff_tlc.py:1216-1409`), start_point='noise':

      preprocess -> denoise_encoder -> grids(image feats) -> prepare_latents
      -> grids(latents) -> per-step { re-split, per-tile [restore scheduler
      state, CFG duplicate, scale_model_input, per-tile add_time_ids, unet,
      CFG combine (+rescale), scheduler step, save state], grids_inverse }.

    `lr_img`: [1, 3, H, W] in [0, 1]. Returns final merged latents
    [1, 4, H/8, W/8].
    """
    h, w = lr_img.shape[2], lr_img.shape[3]
    original_size = (h, w)
    target_size = (h, w)
    lh, lw = h // 8, w // 8

    tlc_vae_latents = TorchLocalAttention(kernel_latent, overlap)
    tlc_vae_img = TorchLocalAttention(kernel_latent, overlap)

    image = lr_img * 2.0 - 1.0                      # preprocess to [-1, 1]
    image_latents = denoise_encoder(image)          # :1250 (prepare_image_latents)
    image_latents = tlc_vae_img.grids(image_latents)   # :1257

    sched = TorchEulerScheduler()
    sched.set_timesteps(num_inference_steps)        # :1249
    gen = torch.Generator().manual_seed(seed)
    latents = torch.randn((1, 4, lh, lw), generator=gen)   # :1261 prepare_latents
    latents = latents * sched.init_noise_sigma
    latents = tlc_vae_latents.grids(latents)        # :1278

    sub_latents_num = latents.shape[0]
    views_scheduler_status = [copy.deepcopy(sched.__dict__)] * sub_latents_num

    # CFG embeds: zeroed negatives (force_zeros_for_empty_prompt, :622-625)
    prompt_embeds_cfg = torch.cat(
        [torch.zeros_like(prompt_embeds), prompt_embeds], dim=0)   # :1288
    add_text_embeds = torch.cat(
        [torch.zeros_like(pooled_embeds), pooled_embeds], dim=0)   # :1289

    for i, t in enumerate(sched.timesteps):         # :1324
        if i >= 1:
            latents = tlc_vae_latents.grids(latents)   # :1326
        concat_grid = []
        for sub_num in range(sub_latents_num):      # :1330
            sched.__dict__.update(views_scheduler_status[sub_num])   # :1331
            sub_latents = latents[sub_num].unsqueeze(0)
            img_sub_latents = image_latents[sub_num].unsqueeze(0)
            latent_model_input = torch.cat([sub_latents] * 2)        # :1334
            img_in = torch.cat([img_sub_latents] * 2)                # :1335
            scaled = sched.scale_model_input(latent_model_input, t)  # :1336
            pos_h = tlc_vae_latents.idxes[sub_num]["i"]              # :1337
            pos_w = tlc_vae_latents.idxes[sub_num]["j"]
            add_time_ids = torch.cat(
                [torch.tensor([list(original_size)]),
                 torch.tensor([[pos_h, pos_w]]),
                 torch.tensor([list(target_size)])], dim=1).float()
            add_time_ids = add_time_ids.repeat(2, 1)                 # :1345
            noise_pred = unet(
                scaled, torch.full((2,), float(t)), prompt_embeds_cfg,
                add_text_embeds, add_time_ids, input_embedding=img_in,
                add_sample=add_sample)                               # :1350
            noise_pred_uncond, noise_pred_text = noise_pred.chunk(2)  # :1364
            noise_pred = noise_pred_uncond + guidance_scale * (
                noise_pred_text - noise_pred_uncond)                  # :1365
            if guidance_rescale > 0.0:
                noise_pred = rescale_noise_cfg_torch(
                    noise_pred, noise_pred_text, guidance_rescale)    # :1369
            sub_latents = sched.step(noise_pred, t, sub_latents)      # :1373
            views_scheduler_status[sub_num] = copy.deepcopy(sched.__dict__)
            concat_grid.append(sub_latents)
        latents = tlc_vae_latents.grids_inverse(
            torch.cat(concat_grid, dim=0))                            # :1409
    return latents
