"""Native MANIQA vs a torch mirror of the published architecture."""
import math

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from faithdiff_tpu.eval.maniqa import (MANIQA, MANIQAConfig, _rel_pos_index,
                                       _shift_mask, convert_maniqa,
                                       make_maniqa, save_maniqa_weights)

CFG = MANIQAConfig(img_size=16, patch_size=4, vit_embed=24, vit_layers=3,
                   vit_heads=4, vit_mlp=48, feature_blocks=(1, 2),
                   embed_dim=24, num_tab=2, swin_depths=(2, 2),
                   swin_heads=(4, 4), window_size=2, dim_mlp=32, scale=0.8)


class TorchViTBlock(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.vit_embed
        self.norm1 = tnn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self.norm2 = tnn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self.attn = tnn.ModuleDict({"qkv": tnn.Linear(d, 3 * d),
                                    "proj": tnn.Linear(d, d)})
        self.mlp = tnn.ModuleDict({"fc1": tnn.Linear(d, cfg.vit_mlp),
                                   "fc2": tnn.Linear(cfg.vit_mlp, d)})
        self.heads = cfg.vit_heads

    def forward(self, x):
        b, s, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).view(b, s, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        o = torch.einsum("bhqk,bkhd->bqhd", a.softmax(-1), v)
        x = x + self.attn["proj"](o.reshape(b, s, d))
        return x + self.mlp["fc2"](
            tnn.functional.gelu(self.mlp["fc1"](self.norm2(x))))


class TorchViT(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, p = cfg.vit_embed, cfg.patch_size
        n = cfg.grid ** 2
        self.patch_embed = tnn.ModuleDict(
            {"proj": tnn.Conv2d(3, d, p, p)})
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchViTBlock(cfg) for _ in range(cfg.vit_layers)])

    def forward(self, x):
        x = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], 1)
        x = x + self.pos_embed
        taps = []
        for blk in self.blocks:
            x = blk(x)
            taps.append(x[:, 1:])
        return taps


class TorchTAB(tnn.Module):
    def __init__(self, n):
        super().__init__()
        self.c_q, self.c_k, self.c_v = (tnn.Linear(n, n) for _ in range(3))

    def forward(self, x):                       # [B, C, N]
        q, k, v = self.c_q(x), self.c_k(x), self.c_v(x)
        a = (torch.einsum("bcn,bdn->bcd", q, k)
             / math.sqrt(x.shape[-1])).softmax(-1)
        return torch.einsum("bcd,bdn->bcn", a, v) + x


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift, dim_mlp, scale, eps):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=eps)
        self.norm2 = tnn.LayerNorm(dim, eps=eps)
        self.attn = tnn.ModuleDict({"qkv": tnn.Linear(dim, 3 * dim),
                                    "proj": tnn.Linear(dim, dim)})
        self.attn["qkv"].relative_position_bias_table = None
        self.rel_bias = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        self.mlp = tnn.ModuleDict({"fc1": tnn.Linear(dim, dim_mlp),
                                   "fc2": tnn.Linear(dim_mlp, dim)})
        self.heads, self.window, self.shift, self.scale = (
            heads, window, shift, scale)

    def forward(self, x, hw):
        h, w = hw
        win, shift = self.window, self.shift
        b, n, c = x.shape
        res = x
        x = self.norm1(x).view(b, h, w, c)
        if shift > 0:
            x = torch.roll(x, (-shift, -shift), (1, 2))
        nh, nw = h // win, w // win
        xw = x.view(b, nh, win, nw, win, c).permute(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nh * nw, win * win, c)
        hd = c // self.heads
        qkv = self.attn["qkv"](xw).view(-1, win * win, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        idx = torch.tensor(_rel_pos_index(win), dtype=torch.long)
        logits = logits + self.rel_bias[idx].permute(2, 0, 1)[None]
        if shift > 0:
            mask = torch.tensor(_shift_mask(h, w, win, shift))
            logits = (logits.view(b, nh * nw, self.heads, win * win,
                                  win * win) + mask[None, :, None]).view(
                b * nh * nw, self.heads, win * win, win * win)
        o = torch.einsum("bhqk,bkhd->bqhd", logits.softmax(-1), v)
        o = self.attn["proj"](o.reshape(-1, win * win, c))
        o = o.view(b, nh, nw, win, win, c).permute(0, 1, 3, 2, 4, 5)
        o = o.reshape(b, h, w, c)
        if shift > 0:
            o = torch.roll(o, (shift, shift), (1, 2))
        x = res + self.scale * o.view(b, n, c)
        return x + self.scale * self.mlp["fc2"](
            tnn.functional.gelu(self.mlp["fc1"](self.norm2(x))))

    def state_dict(self, *a, **kw):
        out = super().state_dict(*a, **kw)
        # expose the bias table under the official name
        pref = kw.get("prefix", "")
        key = [k for k in out if k.endswith("rel_bias")][0]
        out[key.replace("rel_bias", "attn.relative_position_bias_table")] = \
            out.pop(key)
        return out


class TorchMANIQA(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        n = cfg.grid ** 2
        self.vit = TorchViT(cfg)
        cat = cfg.vit_embed * len(cfg.feature_blocks)
        self.tablock1 = tnn.ModuleList(
            [TorchTAB(n) for _ in range(cfg.num_tab)])
        self.conv1 = tnn.Conv2d(cat, cfg.embed_dim, 1)
        self.swintransformer1 = tnn.ModuleDict({"layers": tnn.ModuleList(
            [TorchSwinBlock(cfg.embed_dim, cfg.swin_heads[0],
                            cfg.window_size,
                            0 if i % 2 == 0 else cfg.window_size // 2,
                            cfg.dim_mlp, cfg.scale, cfg.layer_norm_eps)
             for i in range(cfg.swin_depths[0])])})
        self.tablock2 = tnn.ModuleList(
            [TorchTAB(n) for _ in range(cfg.num_tab)])
        self.conv2 = tnn.Conv2d(cfg.embed_dim, cfg.embed_dim // 2, 1)
        self.swintransformer2 = tnn.ModuleDict({"layers": tnn.ModuleList(
            [TorchSwinBlock(cfg.embed_dim // 2, cfg.swin_heads[1],
                            cfg.window_size,
                            0 if i % 2 == 0 else cfg.window_size // 2,
                            cfg.dim_mlp, cfg.scale, cfg.layer_norm_eps)
             for i in range(cfg.swin_depths[1])])})
        d2 = cfg.embed_dim // 2
        self.fc_score = tnn.Sequential(tnn.Linear(d2, d2), tnn.ReLU(),
                                       tnn.Linear(d2, 1), tnn.ReLU())
        self.fc_weight = tnn.Sequential(tnn.Linear(d2, d2), tnn.ReLU(),
                                        tnn.Linear(d2, 1), tnn.Sigmoid())

    def forward(self, x):                       # [B, 3, S, S] in [0, 1]
        cfg = self.cfg
        g = cfg.grid
        x = (x - cfg.norm_mean) / cfg.norm_std
        taps = self.vit(x)
        y = torch.cat([taps[i] for i in cfg.feature_blocks], -1)
        y = y.transpose(1, 2)
        for tab in self.tablock1:
            y = tab(y)
        y = self.conv1(y.view(-1, y.shape[1], g, g))
        y = y.flatten(2).transpose(1, 2)
        for blk in self.swintransformer1["layers"]:
            y = blk(y, (g, g))
        y = y.transpose(1, 2)
        for tab in self.tablock2:
            y = tab(y)
        y = self.conv2(y.view(-1, y.shape[1], g, g))
        y = y.flatten(2).transpose(1, 2)
        for blk in self.swintransformer2["layers"]:
            y = blk(y, (g, g))
        s = self.fc_score(y)[..., 0]
        w = self.fc_weight(y)[..., 0]
        return (s * w).sum(-1) / w.sum(-1).clamp_min(1e-8)


def test_maniqa_matches_torch_mirror(tmp_path):
    torch.manual_seed(0)
    tm = TorchMANIQA(CFG).eval()
    params = convert_maniqa(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, CFG)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    got = MANIQA(CFG).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(img))
    with torch.no_grad():
        want = tm(torch.tensor(img).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=0, atol=2e-4)

    # self-contained npz + deterministic 5-crop factory on a larger image
    wpath = str(tmp_path / "maniqa.npz")
    save_maniqa_weights(params, wpath, CFG)
    fn = make_maniqa(wpath)
    assert fn is not None
    big = rng.uniform(size=(24, 40, 3)).astype(np.float32)
    v1, v2 = fn(big), fn(big)
    assert v1 == v2 and np.isfinite(v1)       # deterministic crops
    assert make_maniqa(str(tmp_path / "missing.npz")) is None
