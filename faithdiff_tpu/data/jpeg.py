"""JPEG compression simulation in JAX.

TPU-native replacement for basicsr's `DiffJPEG` (used by the degradation
engine, `/root/reference/dataloader/realesrgan.py:85,233`): standard JPEG
luma/chroma quantisation with per-sample quality, 8x8 block DCT expressed as
two matmuls (MXU-friendly), 2x chroma subsampling. Non-differentiable
rounding (the reference instantiates `DiffJPEG(differentiable=False)`).

Input/output: [B, H, W, 3] float in [0, 1], H and W multiples of 16.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ITU-T T.81 base quantisation tables
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32)

_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float32)


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II matrix: X = D x D^T."""
    d = np.zeros((8, 8), np.float32)
    for k in range(8):
        for n in range(8):
            d[k, n] = np.cos(np.pi * k * (2 * n + 1) / 16)
    d *= np.sqrt(2.0 / 8.0)
    d[0] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def quality_to_factor(quality: jax.Array) -> jax.Array:
    """JPEG quality (1..100) -> quant table scale factor (JPEG standard)."""
    quality = jnp.asarray(quality, jnp.float32)
    factor = jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2.0)
    return factor / 100.0


def _to_blocks(x: jax.Array) -> jax.Array:
    """[B, H, W] -> [B, H/8 * W/8, 8, 8]."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, (h // 8) * (w // 8), 8, 8)


def _from_blocks(x: jax.Array, h: int, w: int) -> jax.Array:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def _channel_roundtrip(chan: jax.Array, qtable: jax.Array) -> jax.Array:
    """DCT -> quantise(round) -> dequantise -> IDCT for one plane.

    chan: [B, H, W] centered at 0 (y - 128 convention); qtable [B, 8, 8]."""
    h, w = chan.shape[1:]
    blocks = _to_blocks(chan)
    d = jnp.asarray(_DCT)
    coef = jnp.einsum("ij,bnjk,lk->bnil", d, blocks, d,
                      preferred_element_type=jnp.float32)
    q = qtable[:, None]
    coef = jnp.round(coef / q) * q
    rec = jnp.einsum("ji,bnjk,kl->bnil", d, coef, d,
                     preferred_element_type=jnp.float32)
    return _from_blocks(rec, h, w)


def rgb_to_ycbcr(x: jax.Array) -> jax.Array:
    """[B, H, W, 3] in [0,255] -> YCbCr in [0,255] (JFIF)."""
    m = jnp.asarray([
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ], jnp.float32)
    ycc = jnp.einsum("bhwc,kc->bhwk", x, m)
    return ycc + jnp.asarray([0.0, 128.0, 128.0])


def ycbcr_to_rgb(x: jax.Array) -> jax.Array:
    x = x - jnp.asarray([0.0, 128.0, 128.0])
    m = jnp.asarray([
        [1.0, 0.0, 1.402],
        [1.0, -0.344136, -0.714136],
        [1.0, 1.772, 0.0],
    ], jnp.float32)
    return jnp.einsum("bhwk,ck->bhwc", x, m)


@jax.jit
def jpeg_compress(image: jax.Array, quality: jax.Array) -> jax.Array:
    """Simulate JPEG round-trip.

    image: [B, H, W, 3] in [0, 1], H, W % 16 == 0; quality: [B] in (0, 100].
    """
    b, h, w, _ = image.shape
    factor = quality_to_factor(quality)[:, None, None]
    q_luma = jnp.clip(jnp.round(jnp.asarray(_Q_LUMA)[None] * factor), 1, 255)
    q_chroma = jnp.clip(jnp.round(jnp.asarray(_Q_CHROMA)[None] * factor), 1, 255)

    x = jnp.clip(image, 0.0, 1.0).astype(jnp.float32) * 255.0
    ycc = rgb_to_ycbcr(x)
    y = ycc[..., 0] - 128.0
    # 2x chroma subsample (average pooling, as basicsr's ChromaSubsampling)
    cb = ycc[..., 1].reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4)) - 128.0
    cr = ycc[..., 2].reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4)) - 128.0

    y = _channel_roundtrip(y, q_luma) + 128.0
    cb = _channel_roundtrip(cb, q_chroma) + 128.0
    cr = _channel_roundtrip(cr, q_chroma) + 128.0

    # chroma upsample (nearest 2x)
    cb = jnp.repeat(jnp.repeat(cb, 2, axis=1), 2, axis=2)
    cr = jnp.repeat(jnp.repeat(cr, 2, axis=1), 2, axis=2)

    rgb = ycbcr_to_rgb(jnp.stack([y, cb, cr], axis=-1))
    return jnp.clip(rgb / 255.0, 0.0, 1.0).astype(image.dtype)


def pad_to_16(image: jax.Array) -> tuple[jax.Array, int, int]:
    """Replicate-pad [B, H, W, C] to multiples of 16 (JPEG block + subsample)."""
    h, w = image.shape[1:3]
    ph = (16 - h % 16) % 16
    pw = (16 - w % 16) % 16
    if ph or pw:
        image = jnp.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return image, h, w
