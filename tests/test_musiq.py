"""Native MUSIQ vs a torch mirror of the published architecture."""
import math

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from faithdiff_tpu.eval.musiq import (MUSIQ, MUSIQConfig, convert_musiq,
                                      make_musiq, save_musiq_weights,
                                      tokenize_multiscale)

CFG = MUSIQConfig(patch_size=8, hidden_size=32, num_layers=2, num_heads=4,
                  mlp_dim=64, grid_size=5, num_scales=3,
                  scale_longer_sides=(24, 16), max_tokens=56)


class TorchBlock(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.hidden_size
        self.norm1 = tnn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self.norm2 = tnn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self.attn = tnn.ModuleDict({n: tnn.Linear(d, d)
                                    for n in ("q", "k", "v", "out")})
        self.mlp = tnn.ModuleDict({"fc1": tnn.Linear(d, cfg.mlp_dim),
                                   "fc2": tnn.Linear(cfg.mlp_dim, d)})
        self.heads = cfg.num_heads

    def forward(self, x, bias):
        b, s, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        q = self.attn["q"](h).view(b, s, self.heads, hd)
        k = self.attn["k"](h).view(b, s, self.heads, hd)
        v = self.attn["v"](h).view(b, s, self.heads, hd)
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        logits = logits + bias[:, None, None, :]
        o = torch.einsum("bhqk,bkhd->bqhd", logits.softmax(-1), v)
        x = x + self.attn["out"](o.reshape(b, s, d))
        h = self.norm2(x)
        return x + self.mlp["fc2"](
            tnn.functional.gelu(self.mlp["fc1"](h)))


class TorchMUSIQ(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size
        self.patch_proj = tnn.Linear(cfg.patch_size ** 2 * 3, d)
        self.hse = tnn.Parameter(
            torch.randn(cfg.grid_size, cfg.grid_size, d) * 0.02)
        self.sce = tnn.Parameter(torch.randn(cfg.num_scales, d) * 0.02)
        self.cls = tnn.Parameter(torch.randn(d) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchBlock(cfg) for _ in range(cfg.num_layers)])
        self.norm = tnn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self.head = tnn.Linear(d, 1)

    def forward(self, patches, grid, sid, mask):
        b, n, _ = patches.shape
        x = self.patch_proj(patches * 2.0 - 1.0)
        x = x + self.hse[grid[..., 0], grid[..., 1]]
        x = x + self.sce[sid]
        x = x * mask[..., None]
        x = torch.cat(
            [self.cls.expand(b, 1, -1), x], dim=1)
        full = torch.cat([torch.ones(b, 1), mask], dim=1)
        bias = torch.where(full > 0, 0.0, -1e9)
        for blk in self.blocks:
            x = blk(x, bias)
        return self.head(self.norm(x)[:, 0])[:, 0]


def test_musiq_matches_torch_mirror(tmp_path):
    torch.manual_seed(0)
    tm = TorchMUSIQ(CFG).eval()
    params = convert_musiq(
        {k: v.numpy() for k, v in tm.state_dict().items()}, CFG)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(40, 56, 3)).astype(np.float32)
    toks = tokenize_multiscale(img, CFG)
    # tokenization invariants: 3 scales present, padding masked
    assert set(np.unique(toks[2][0][toks[3][0] > 0])) == {0, 1, 2}
    assert toks[0].shape == (1, CFG.max_tokens, CFG.patch_size ** 2 * 3)
    assert float(toks[3].sum()) < CFG.max_tokens  # real padding exercised

    got = float(MUSIQ(CFG).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        *map(jnp.asarray, toks))[0])
    with torch.no_grad():
        want = float(tm(torch.tensor(toks[0]),
                        torch.tensor(toks[1]).long(),
                        torch.tensor(toks[2]).long(),
                        torch.tensor(toks[3]))[0])
    assert abs(got - want) < 1e-4, (got, want)

    # mask invariance: junk in padded slots must not change the score
    toks_junk = list(map(np.copy, toks))
    n_real = int(toks[3].sum())
    toks_junk[0][0, n_real:] = rng.uniform(size=toks_junk[0][0, n_real:].shape)
    got2 = float(MUSIQ(CFG).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        *map(jnp.asarray, toks_junk))[0])
    assert abs(got2 - got) < 1e-5

    # weights-gated, self-contained npz round trip
    wpath = str(tmp_path / "musiq.npz")
    save_musiq_weights(params, wpath, CFG)
    fn = make_musiq(wpath)
    assert fn is not None
    assert abs(fn(img) - want) < 1e-4
    assert make_musiq(str(tmp_path / "missing.npz")) is None


def test_musiq_native_scale_crops_to_budget():
    # an image whose native grid exceeds the token budget gets centre-
    # cropped, never errors, and still scores
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(200, 300, 3)).astype(np.float32)
    toks = tokenize_multiscale(img, CFG)
    assert toks[0].shape[1] == CFG.max_tokens
    assert float(toks[3].sum()) <= CFG.max_tokens
