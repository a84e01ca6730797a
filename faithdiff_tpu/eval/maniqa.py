"""Native MANIQA (Yang et al. 2022, Multi-dimension Attention Network).

The reference scores `maniqa-pipal` through pyiqa
(`/root/reference/test_metrics.py:127-141`). This is the published
architecture in JAX:

- a ViT patch-8 backbone; token features from four intermediate blocks
  are channel-concatenated (the paper taps blocks 6-9 of ViT-B/8);
- stage 1: transposed attention blocks (TAB — attention across the
  *channel* axis), 1x1 conv 4D -> D, then a Swin stage (window attention
  with relative position bias, alternating cyclic shift) at scale 0.8
  residuals;
- stage 2: the same with D -> D/2;
- dual heads: per-token quality and weight branches, final score
  = sum(score * weight) / sum(weight) (patch-weighted pooling).

Everything is `MANIQAConfig`-parameterized so the torch-mirror parity
fixture runs a tiny model; the default config is ViT-B/8 @ 224 as
published. Weights-gated like the other learned metrics: `make_maniqa`
returns None without a converted checkpoint. `convert_maniqa` maps the
official torch layout (timm ViT naming under `vit.*`, `tablock{1,2}`,
`conv{1,2}`, swin stages, `fc_score`/`fc_weight`).

Evaluation protocol: the published model scores 224² crops; `make_maniqa`
averages a deterministic 5-crop (four corners + centre) instead of the
paper's random crops so results are reproducible run to run.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import LayerNorm


@dataclasses.dataclass(frozen=True)
class MANIQAConfig:
    img_size: int = 224
    patch_size: int = 8
    vit_embed: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp: int = 3072
    feature_blocks: Tuple[int, ...] = (6, 7, 8, 9)
    embed_dim: int = 768          # stage-1 width (conv1 output)
    num_tab: int = 2              # TAB blocks per stage
    swin_depths: Tuple[int, ...] = (2, 2)
    swin_heads: Tuple[int, ...] = (4, 4)
    window_size: int = 4
    dim_mlp: int = 768
    scale: float = 0.8            # swin residual scale
    norm_mean: float = 0.5
    norm_std: float = 0.5
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


# ---------------------------------------------------------------------------
# ViT backbone (timm vit_*_patch8 layout)
# ---------------------------------------------------------------------------

class _ViTBlock(nn.Module):
    cfg: MANIQAConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, s, d = x.shape
        hd = d // cfg.vit_heads
        h = LayerNorm(cfg.layer_norm_eps, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(h).reshape(
            b, s, 3, cfg.vit_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        o = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)
        x = x + nn.Dense(d, name="proj")(o.reshape(b, s, d))
        h = LayerNorm(cfg.layer_norm_eps, name="norm2")(x)
        h = nn.Dense(cfg.vit_mlp, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(d, name="fc2")(h)


class ViTBackbone(nn.Module):
    cfg: MANIQAConfig

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        """x: [B, H, W, 3] normalised. Returns per-block token features
        (cls dropped), each [B, N, D]."""
        cfg = self.cfg
        p = cfg.patch_size
        x = nn.Conv(cfg.vit_embed, (p, p), (p, p), padding="VALID",
                    name="patch_proj")(x)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        cls = self.param("cls", nn.initializers.normal(0.02), (d,),
                         jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (gh * gw + 1, d), jnp.float32)
        x = x + pos[None]
        taps = []
        for i in range(cfg.vit_layers):
            x = _ViTBlock(cfg, name=f"block{i}")(x)
            taps.append(x[:, 1:])
        return taps


# ---------------------------------------------------------------------------
# TAB: attention transposed to the channel axis
# ---------------------------------------------------------------------------

class TABlock(nn.Module):
    """x: [B, C, N]; q/k/v are linear over N, attention is [C, C]."""

    @nn.compact
    def __call__(self, x):
        n = x.shape[-1]
        q = nn.Dense(n, name="c_q")(x)
        k = nn.Dense(n, name="c_k")(x)
        v = nn.Dense(n, name="c_v")(x)
        attn = jax.nn.softmax(
            jnp.einsum("bcn,bdn->bcd", q, k) / np.sqrt(n), axis=-1)
        return jnp.einsum("bcd,bdn->bcn", attn, v) + x


# ---------------------------------------------------------------------------
# Swin stage (window attention, relative position bias, cyclic shift)
# ---------------------------------------------------------------------------

def _rel_pos_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]          # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """Swin SW-MSA mask: [num_windows, w², w²], 0 allowed / -1e9 blocked."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = np.roll(img, (-shift, -shift), (0, 1))
    wins = img.reshape(h // win, win, w // win, win).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, win * win)
    mask = (wins[:, :, None] != wins[:, None, :]) * -1e9
    return mask.astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    dim_mlp: int
    scale: float
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        h, w = hw
        win, shift = self.window, self.shift
        b, n, c = x.shape
        res = x
        x = LayerNorm(self.eps, name="norm1")(x).reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), (1, 2))
        nh, nw = h // win, w // win
        xw = x.reshape(b, nh, win, nw, win, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nh * nw, win * win, c)

        hd = c // self.heads
        qkv = nn.Dense(3 * c, name="qkv")(xw).reshape(
            -1, win * win, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        table = self.param("rel_bias", nn.initializers.normal(0.02),
                           ((2 * win - 1) ** 2, self.heads), jnp.float32)
        idx = _rel_pos_index(win)
        logits = logits + table[idx].transpose(2, 0, 1)[None]
        if shift > 0:
            mask = jnp.asarray(_shift_mask(h, w, win, shift))
            logits = (logits.reshape(b, nh * nw, self.heads,
                                     win * win, win * win)
                      + mask[None, :, None]).reshape(
                          b * nh * nw, self.heads, win * win, win * win)
        o = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)
        o = nn.Dense(c, name="proj")(o.reshape(-1, win * win, c))
        o = o.reshape(b, nh, nw, win, win, c).transpose(0, 1, 3, 2, 4, 5)
        o = o.reshape(b, h, w, c)
        if shift > 0:
            o = jnp.roll(o, (shift, shift), (1, 2))
        x = res + self.scale * o.reshape(b, n, c)
        hmid = LayerNorm(self.eps, name="norm2")(x)
        hmid = nn.gelu(nn.Dense(self.dim_mlp, name="fc1")(hmid),
                       approximate=False)
        return x + self.scale * nn.Dense(c, name="fc2")(hmid)


class SwinStage(nn.Module):
    dim: int
    depth: int
    heads: int
    window: int
    dim_mlp: int
    scale: float

    @nn.compact
    def __call__(self, x, hw):
        for i in range(self.depth):
            x = SwinBlock(self.dim, self.heads, self.window,
                          0 if i % 2 == 0 else self.window // 2,
                          self.dim_mlp, self.scale, name=f"block{i}")(x, hw)
        return x


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

class MANIQA(nn.Module):
    cfg: MANIQAConfig = MANIQAConfig()

    @nn.compact
    def __call__(self, x):
        """x: [B, S, S, 3] in [0, 1] (S = cfg.img_size). Returns [B]."""
        cfg = self.cfg
        g = cfg.grid
        n = g * g
        x = (x - cfg.norm_mean) / cfg.norm_std
        taps = ViTBackbone(cfg, name="vit")(x)
        feats = jnp.concatenate([taps[i] for i in cfg.feature_blocks],
                                axis=-1)                   # [B, N, 4D]
        # stage 1
        y = feats.transpose(0, 2, 1)                       # [B, C, N]
        for i in range(cfg.num_tab):
            y = TABlock(name=f"tab1_{i}")(y)
        y = y.transpose(0, 2, 1).reshape(-1, g, g, y.shape[1])
        y = nn.Conv(cfg.embed_dim, (1, 1), name="conv1")(y)
        y = SwinStage(cfg.embed_dim, cfg.swin_depths[0], cfg.swin_heads[0],
                      cfg.window_size, cfg.dim_mlp, cfg.scale,
                      name="swin1")(y.reshape(-1, n, cfg.embed_dim), (g, g))
        # stage 2
        y = y.transpose(0, 2, 1)
        for i in range(cfg.num_tab):
            y = TABlock(name=f"tab2_{i}")(y)
        y = y.transpose(0, 2, 1).reshape(-1, g, g, cfg.embed_dim)
        y = nn.Conv(cfg.embed_dim // 2, (1, 1), name="conv2")(y)
        y = SwinStage(cfg.embed_dim // 2, cfg.swin_depths[1],
                      cfg.swin_heads[1], cfg.window_size, cfg.dim_mlp,
                      cfg.scale, name="swin2")(
                          y.reshape(-1, n, cfg.embed_dim // 2), (g, g))
        # patch-weighted dual heads
        d2 = cfg.embed_dim // 2
        s = nn.relu(nn.Dense(d2, name="score_fc1")(y))
        s = nn.relu(nn.Dense(1, name="score_fc2")(s))[..., 0]   # [B, N]
        w = nn.relu(nn.Dense(d2, name="weight_fc1")(y))
        w = jax.nn.sigmoid(nn.Dense(1, name="weight_fc2")(w))[..., 0]
        return jnp.sum(s * w, axis=-1) / jnp.maximum(
            jnp.sum(w, axis=-1), 1e-8)


# ---------------------------------------------------------------------------
# converter + factory
# ---------------------------------------------------------------------------

def convert_maniqa(state_dict: Dict,
                   cfg: MANIQAConfig = MANIQAConfig()) -> Dict:
    """Official torch layout -> params. `vit.*` follows timm ViT naming
    (`blocks.N.attn.qkv` fused, `mlp.fc1/2`), the rest the MANIQA module
    names (`tablock{1,2}.N.c_{q,k,v}`, `conv{1,2}`,
    `swintransformer{1,2}.layers.N....`, `fc_score.*`, `fc_weight.*`)."""
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}

    def dense(key):
        return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}

    def norm(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    vit: Dict = {
        "patch_proj": {"kernel": sd["vit.patch_embed.proj.weight"
                                    ].transpose(2, 3, 1, 0),
                       "bias": sd["vit.patch_embed.proj.bias"]},
        "cls": sd["vit.cls_token"].reshape(-1),
        "pos": sd["vit.pos_embed"].reshape(
            -1, sd["vit.pos_embed"].shape[-1]),
    }
    for i in range(cfg.vit_layers):
        p = f"vit.blocks.{i}"
        vit[f"block{i}"] = {
            "norm1": norm(f"{p}.norm1"), "norm2": norm(f"{p}.norm2"),
            "qkv": dense(f"{p}.attn.qkv"), "proj": dense(f"{p}.attn.proj"),
            "fc1": dense(f"{p}.mlp.fc1"), "fc2": dense(f"{p}.mlp.fc2"),
        }
    params: Dict = {"vit": vit}
    for stage in (1, 2):
        for i in range(cfg.num_tab):
            p = f"tablock{stage}.{i}"
            params[f"tab{stage}_{i}"] = {nm: dense(f"{p}.{nm}")
                                         for nm in ("c_q", "c_k", "c_v")}
        params[f"conv{stage}"] = {
            "kernel": sd[f"conv{stage}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"conv{stage}.bias"]}
        depth = cfg.swin_depths[stage - 1]
        sw: Dict = {}
        for i in range(depth):
            p = f"swintransformer{stage}.layers.{i}"
            sw[f"block{i}"] = {
                "norm1": norm(f"{p}.norm1"), "norm2": norm(f"{p}.norm2"),
                "qkv": dense(f"{p}.attn.qkv"), "proj": dense(f"{p}.attn.proj"),
                "fc1": dense(f"{p}.mlp.fc1"), "fc2": dense(f"{p}.mlp.fc2"),
                "rel_bias": sd[f"{p}.attn.relative_position_bias_table"],
            }
        params[f"swin{stage}"] = sw
    # fc_score / fc_weight: Sequential(Linear, ReLU, Linear, act)
    lin = lambda head: sorted(
        int(k.split(".")[1]) for k in sd
        if k.startswith(f"{head}.") and k.endswith(".weight"))
    for head, ours in (("fc_score", "score"), ("fc_weight", "weight")):
        i0, i1 = lin(head)[:2]
        params[f"{ours}_fc1"] = dense(f"{head}.{i0}")
        params[f"{ours}_fc2"] = dense(f"{head}.{i1}")
    return params


_DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "maniqa.npz")


def make_maniqa(weights_path: Optional[str] = None,
                cfg: Optional[MANIQAConfig] = None):
    """MANIQA callable `(img [H, W, 3] in [0,1]) -> float` (deterministic
    5-crop mean), or None when no converted weights exist."""
    from .lpips import load_lpips_params

    path = weights_path or _DEFAULT_WEIGHTS
    if not os.path.exists(path):
        return None
    tree = load_lpips_params(path)
    blob = tree.pop("_config", None)
    if cfg is None:
        if blob is not None:
            import json

            raw = json.loads(str(np.asarray(blob)))
            cfg = MANIQAConfig(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in raw.items()})
        else:
            cfg = MANIQAConfig()
    model = MANIQA(cfg)
    apply = jax.jit(model.apply)
    params = {"params": tree}
    s = cfg.img_size

    def call(img: np.ndarray) -> float:
        from PIL import Image

        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        h, w = img.shape[:2]
        if h < s or w < s:
            img = np.asarray(Image.fromarray(
                np.uint8(np.clip(img, 0, 1) * 255)).resize(
                    (max(w, s), max(h, s)), Image.BICUBIC)
            ).astype(np.float32) / 255.0
            h, w = img.shape[:2]
        crops = [img[y:y + s, x:x + s]
                 for y, x in ((0, 0), (0, w - s), (h - s, 0),
                              (h - s, w - s),
                              ((h - s) // 2, (w - s) // 2))]
        batch = jnp.asarray(np.stack(crops), jnp.float32)
        return float(jnp.mean(apply(params, batch)))

    return call


def save_maniqa_weights(params: Dict, path: str,
                        cfg: Optional[MANIQAConfig] = None) -> None:
    """Write a self-contained MANIQA npz (params + config JSON)."""
    import json

    from .lpips import save_lpips_params

    extra: Dict = {}
    if cfg is not None:
        extra["_config"] = np.asarray(json.dumps(dataclasses.asdict(cfg)))
    save_lpips_params({**params, **extra}, path)
