"""Native MUSIQ (Multi-scale Image Quality transformer, Ke et al. 2021).

The reference scores `musiq` through pyiqa
(`/root/reference/test_metrics.py:127-141`). This is the metric itself in
JAX, following the published architecture:

- multi-scale input: the native-resolution image plus aspect-ratio-
  preserving (ARP) resizes with longer side 384 and 224;
- each scale is cut into a full 32x32 patch grid, every patch linearly
  projected to the transformer width;
- hash-based 2D spatial embeddings (HSE): a learned [G, G, D] table
  indexed by the patch's fractional grid position, so one table serves
  every resolution and aspect ratio;
- learned per-scale embeddings (SCE) and a [CLS] token;
- a pre-norm ViT encoder over the concatenated multi-scale sequence with
  a key-side mask for padding, quality score = linear head on CLS.

TPU-first shape discipline: the token sequence is padded to a *static*
`max_tokens` with an explicit mask (MUSIQ's own variable-length trick),
so one compiled program serves every input resolution.

Weights-gated like `eval/{lpips,dists,fid,clipiqa}.py`: `make_musiq`
returns None without a converted checkpoint and the harness reports
UNAVAILABLE. `convert_musiq` maps the canonical torch layout used by the
parity fixture (`tests/test_musiq.py`); real released checkpoints (TF
google-research/musiq or pyiqa's port) convert with a key-rename pass on
top of the same tensors.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import LayerNorm


@dataclasses.dataclass(frozen=True)
class MUSIQConfig:
    patch_size: int = 32
    hidden_size: int = 384
    num_layers: int = 14
    num_heads: int = 6
    mlp_dim: int = 1152
    grid_size: int = 10           # HSE hash-grid resolution G
    num_scales: int = 3           # native + len(scale_longer_sides)
    scale_longer_sides: Tuple[int, ...] = (384, 224)
    max_tokens: int = 512         # static sequence cap (excl. CLS)
    layer_norm_eps: float = 1e-6


class _EncoderBlock(nn.Module):
    cfg: MUSIQConfig

    @nn.compact
    def __call__(self, x, mask_bias):
        cfg = self.cfg
        h = LayerNorm(cfg.layer_norm_eps, name="norm1")(x)
        b, s, d = h.shape
        hd = d // cfg.num_heads
        q = nn.Dense(d, name="q")(h).reshape(b, s, cfg.num_heads, hd)
        k = nn.Dense(d, name="k")(h).reshape(b, s, cfg.num_heads, hd)
        v = nn.Dense(d, name="v")(h).reshape(b, s, cfg.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        logits = logits + mask_bias[:, None, None, :]     # mask keys
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, d)
        x = x + nn.Dense(d, name="out")(o)
        h = LayerNorm(cfg.layer_norm_eps, name="norm2")(x)
        h = nn.Dense(cfg.mlp_dim, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="fc2")(h)
        return x + h


class MUSIQ(nn.Module):
    cfg: MUSIQConfig = MUSIQConfig()

    @nn.compact
    def __call__(self, patches, grid_pos, scale_ids, mask):
        """patches:   [B, N, P*P*3] pixel patches in [0, 1] (padded),
        grid_pos:  [B, N, 2] int32 HSE indices (row, col) in [0, G),
        scale_ids: [B, N] int32 scale index per token,
        mask:      [B, N] 1.0 for real tokens.
        Returns [B] quality scores."""
        cfg = self.cfg
        b, n, _ = patches.shape
        x = nn.Dense(cfg.hidden_size, name="patch_proj")(
            patches * 2.0 - 1.0)                           # [0,1] -> [-1,1]
        hse = self.param("hse", nn.initializers.normal(0.02),
                         (cfg.grid_size, cfg.grid_size, cfg.hidden_size),
                         jnp.float32)
        x = x + hse[grid_pos[..., 0], grid_pos[..., 1]]
        sce = self.param("sce", nn.initializers.normal(0.02),
                         (cfg.num_scales, cfg.hidden_size), jnp.float32)
        x = x + sce[scale_ids]
        x = x * mask[..., None]
        cls = self.param("cls", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x], axis=1)
        full_mask = jnp.concatenate([jnp.ones((b, 1), x.dtype), mask], axis=1)
        bias = jnp.where(full_mask > 0, 0.0, -1e9).astype(x.dtype)
        for i in range(cfg.num_layers):
            x = _EncoderBlock(cfg, name=f"block{i}")(x, bias)
        x = LayerNorm(cfg.layer_norm_eps, name="norm")(x)
        return nn.Dense(1, name="head")(x[:, 0])[:, 0]


# ---------------------------------------------------------------------------
# host-side multi-scale tokenization
# ---------------------------------------------------------------------------

def _arp_resize(img: np.ndarray, longer_side: int) -> np.ndarray:
    from PIL import Image

    h, w = img.shape[:2]
    s = longer_side / max(h, w)
    nh, nw = max(1, round(h * s)), max(1, round(w * s))
    return np.asarray(
        Image.fromarray(np.uint8(np.clip(img, 0, 1) * 255)).resize(
            (nw, nh), Image.BILINEAR)).astype(np.float32) / 255.0


def _patchify(img: np.ndarray, cfg: MUSIQConfig,
              scale_id: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full patch grid of one scale -> (patches [N, P*P*3], grid_pos
    [N, 2], scale_ids [N]). HSE index: floor(i * G / n_rows)."""
    p = cfg.patch_size
    h, w = img.shape[:2]
    ph, pw = -(-h // p), -(-w // p)                        # ceil-div
    pad = np.zeros((ph * p, pw * p, 3), np.float32)
    pad[:h, :w] = img
    patches = pad.reshape(ph, p, pw, p, 3).transpose(0, 2, 1, 3, 4)
    patches = patches.reshape(ph * pw, p * p * 3)
    rows, cols = np.meshgrid(np.arange(ph), np.arange(pw), indexing="ij")
    grid = np.stack([
        np.floor(rows.reshape(-1) * cfg.grid_size / ph),
        np.floor(cols.reshape(-1) * cfg.grid_size / pw)], -1).astype(np.int32)
    return patches, grid, np.full((ph * pw,), scale_id, np.int32)


def tokenize_multiscale(img: np.ndarray, cfg: MUSIQConfig
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
    """img: [H, W, 3] float in [0, 1] -> static-shape token arrays
    (patches [1, N, P*P*3], grid_pos, scale_ids, mask), N = cfg.max_tokens.

    The native scale is centrally cropped to at most `max_tokens` minus the
    fixed-size resized scales' budget, preferring full coverage."""
    budget = cfg.max_tokens
    resized = [_arp_resize(img, s) for s in cfg.scale_longer_sides]
    fixed = sum((-(-r.shape[0] // cfg.patch_size))
                * (-(-r.shape[1] // cfg.patch_size)) for r in resized)
    native_budget = budget - fixed
    if native_budget <= 0:
        raise ValueError(
            f"max_tokens={cfg.max_tokens} below the resized-scale budget "
            f"{fixed}")
    p = cfg.patch_size
    h, w = img.shape[:2]
    ph, pw = -(-h // p), -(-w // p)
    if ph * pw > native_budget:
        # centre-crop the native scale down to the token budget, keeping
        # the aspect ratio (MUSIQ caps the native sequence the same way)
        ratio = np.sqrt(native_budget / (ph * pw))
        nph, npw = max(1, int(ph * ratio)), max(1, int(pw * ratio))
        while nph * npw > native_budget:
            if nph >= npw:
                nph -= 1
            else:
                npw -= 1
        y0 = (ph - nph) // 2 * p
        x0 = (pw - npw) // 2 * p
        native = img[y0:y0 + nph * p, x0:x0 + npw * p]
    else:
        native = img
    parts = [_patchify(native, cfg, 0)]
    parts += [_patchify(r, cfg, 1 + i) for i, r in enumerate(resized)]
    patches = np.concatenate([q[0] for q in parts])
    grid = np.concatenate([q[1] for q in parts])
    sid = np.concatenate([q[2] for q in parts])
    n = patches.shape[0]
    assert n <= cfg.max_tokens, (n, cfg.max_tokens)
    pad = cfg.max_tokens - n
    patches = np.pad(patches, ((0, pad), (0, 0)))
    grid = np.pad(grid, ((0, pad), (0, 0)))
    sid = np.pad(sid, (0, pad))
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return patches[None], grid[None], sid[None], mask[None]


# ---------------------------------------------------------------------------
# converter + factory
# ---------------------------------------------------------------------------

def convert_musiq(state_dict: Dict, cfg: MUSIQConfig = MUSIQConfig(),
                  key_map: Optional[Dict[str, str]] = None) -> Dict:
    """Canonical torch layout -> params. Linear `*.weight` transpose to
    kernels; `hse` accepts [G, G, D] or the TF [G*G, D] flattening.

    `key_map`: optional released-checkpoint rename pass — maps SOURCE key
    names (e.g. a TF google-research/musiq or pyiqa export) to the
    canonical names consumed here; unmapped keys pass through unchanged.
    Record the mapping for a given release as a JSON fixture next to the
    checkpoint (`{"their.key": "blocks.0.attn.q.weight", ...}`) and load
    with `json.load` — the tensors themselves are layout-identical
    (fused-free q/k/v/out, row-major linears), so renaming is sufficient."""
    if key_map is not None:
        state_dict = {key_map.get(k, k): v for k, v in state_dict.items()}
    params: Dict = {}

    def dense(prefix):
        return {"kernel": np.asarray(state_dict[f"{prefix}.weight"],
                                     np.float32).T,
                "bias": np.asarray(state_dict[f"{prefix}.bias"], np.float32)}

    def norm(prefix):
        return {"scale": np.asarray(state_dict[f"{prefix}.weight"],
                                    np.float32),
                "bias": np.asarray(state_dict[f"{prefix}.bias"], np.float32)}

    params["patch_proj"] = dense("patch_proj")
    hse = np.asarray(state_dict["hse"], np.float32)
    g = cfg.grid_size
    params["hse"] = hse.reshape(g, g, -1)
    params["sce"] = np.asarray(state_dict["sce"], np.float32)
    params["cls"] = np.asarray(state_dict["cls"], np.float32).reshape(-1)
    for i in range(cfg.num_layers):
        blk: Dict = {}
        blk["norm1"] = norm(f"blocks.{i}.norm1")
        blk["norm2"] = norm(f"blocks.{i}.norm2")
        for nm in ("q", "k", "v", "out"):
            blk[nm] = dense(f"blocks.{i}.attn.{nm}")
        blk["fc1"] = dense(f"blocks.{i}.mlp.fc1")
        blk["fc2"] = dense(f"blocks.{i}.mlp.fc2")
        params[f"block{i}"] = blk
    params["norm"] = norm("norm")
    params["head"] = dense("head")
    return params


_DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "musiq.npz")


def make_musiq(weights_path: Optional[str] = None,
               cfg: Optional[MUSIQConfig] = None):
    """MUSIQ callable `(img [H, W, 3] in [0,1]) -> float`, or None when no
    converted weights exist (harness reports UNAVAILABLE). The npz may
    carry the config JSON under `_config` (see `save_musiq_weights`)."""
    from .lpips import load_lpips_params

    path = weights_path or _DEFAULT_WEIGHTS
    if not os.path.exists(path):
        return None
    tree = load_lpips_params(path)
    blob = tree.pop("_config", None)
    if cfg is None:
        if blob is not None:
            import json

            cfg = MUSIQConfig(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in json.loads(str(np.asarray(blob))).items()})
        else:
            cfg = MUSIQConfig()
    model = MUSIQ(cfg)
    apply = jax.jit(model.apply)
    params = {"params": tree}

    def call(img: np.ndarray) -> float:
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        toks = tokenize_multiscale(np.asarray(img, np.float32), cfg)
        return float(apply(params, *map(jnp.asarray, toks))[0])

    return call


def save_musiq_weights(params: Dict, path: str,
                       cfg: Optional[MUSIQConfig] = None) -> None:
    """Write a self-contained MUSIQ npz (params + config JSON)."""
    import json

    from .lpips import save_lpips_params

    extra: Dict = {}
    if cfg is not None:
        extra["_config"] = np.asarray(json.dumps(dataclasses.asdict(cfg)))
    save_lpips_params({**params, **extra}, path)
