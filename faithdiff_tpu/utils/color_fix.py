"""Wavelet / AdaIN color correction.

JAX reimplementation of `/root/reference/utils/color_fix.py` (itself from
sd-webui-stablesr): transfer the low-frequency (color/illumination) content
of the LQ source onto the restored output. NHWC layout; values in [0, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_WAVELET_KERNEL = np.array(
    [
        [0.0625, 0.125, 0.0625],
        [0.125, 0.25, 0.125],
        [0.0625, 0.125, 0.0625],
    ],
    dtype=np.float32,
)


def wavelet_blur(image: jax.Array, radius: int) -> jax.Array:
    """Depthwise 3x3 dilated low-pass filter with replicate padding
    (`color_fix.py:73-92`). image: [B, H, W, C]."""
    c = image.shape[-1]
    kernel = jnp.asarray(_WAVELET_KERNEL)[:, :, None, None]
    kernel = jnp.tile(kernel, (1, 1, 1, c))  # HWIO with feature_group_count=C
    padded = jnp.pad(
        image,
        ((0, 0), (radius, radius), (radius, radius), (0, 0)),
        mode="edge",
    )
    return jax.lax.conv_general_dilated(
        padded.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ).astype(image.dtype)


def wavelet_decomposition(image: jax.Array, levels: int = 5):
    """Return (high_freq, low_freq) across `levels` octaves
    (`color_fix.py:94-106`)."""
    high_freq = jnp.zeros_like(image)
    for i in range(levels):
        radius = 2 ** i
        low_freq = wavelet_blur(image, radius)
        high_freq = high_freq + (image - low_freq)
        image = low_freq
    return high_freq, low_freq


def wavelet_reconstruction(content: jax.Array, style: jax.Array) -> jax.Array:
    """content high-freq + style low-freq (`color_fix.py:108-119`)."""
    content_high, _ = wavelet_decomposition(content)
    _, style_low = wavelet_decomposition(style)
    return content_high + style_low


def calc_mean_std(feat: jax.Array, eps: float = 1e-5):
    """Per-channel spatial mean/std over [B, H, W, C] (`color_fix.py:44-57`).

    Matches torch's unbiased variance (``Tensor.var`` default ddof=1)."""
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    mean = jnp.mean(flat, axis=1, keepdims=True)
    n = h * w
    var = jnp.sum(jnp.square(flat - mean), axis=1, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var + eps)
    return mean.reshape(b, 1, 1, c), std.reshape(b, 1, 1, c)


def adaptive_instance_normalization(
    content: jax.Array, style: jax.Array
) -> jax.Array:
    """Match content's per-channel mean/std to style's (`color_fix.py:59-71`)."""
    style_mean, style_std = calc_mean_std(style)
    content_mean, content_std = calc_mean_std(content)
    normalized = (content - content_mean) / content_std
    return normalized * style_std + style_mean


def wavelet_color_fix(target: jax.Array, source: jax.Array) -> jax.Array:
    """[B, H, W, C] in [0,1] -> color-fixed, clipped to [0,1]."""
    return jnp.clip(wavelet_reconstruction(target, source), 0.0, 1.0)


def adain_color_fix(target: jax.Array, source: jax.Array) -> jax.Array:
    return jnp.clip(adaptive_instance_normalization(target, source), 0.0, 1.0)
