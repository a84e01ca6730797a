"""Image size / conversion helpers and the HDR (Mertens fusion) effect.

JAX/numpy replacements for `/root/reference/utils/image_process.py` (OpenCV
there). NHWC, float in [0, 1] unless noted.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def check_image_size(
    img: np.ndarray, padder_size: int = 8
) -> Tuple[np.ndarray, int, int, int, int]:
    """Replicate-pad an HWC uint8/float image (bottom/right) to a multiple of
    `padder_size` (`image_process.py:7-21`).

    Returns (padded, width, height, padded_width, padded_height)."""
    height, width = img.shape[:2]
    mod_pad_h = (padder_size - height % padder_size) % padder_size
    mod_pad_w = (padder_size - width % padder_size) % padder_size
    padded = np.pad(
        img, ((0, mod_pad_h), (0, mod_pad_w)) + ((0, 0),) * (img.ndim - 2),
        mode="edge",
    )
    return padded, width, height, width + mod_pad_w, height + mod_pad_h


def image_to_array(img: np.ndarray) -> np.ndarray:
    """HWC uint8 -> [1, H, W, C] float32 in [0, 1] (`image_process.py:24-27`)."""
    if img.ndim == 2:
        img = img[:, :, None]
    return (img.astype(np.float32) / 255.0)[None]


def array_to_image(x: np.ndarray) -> np.ndarray:
    """[., H, W, C] float in [0, 1] -> HWC uint8 (`image_process.py:30-34`)."""
    x = np.asarray(x, dtype=np.float32)
    while x.ndim > 3:
        x = x[0]
    x = np.clip(x, 0.0, 1.0)
    return np.uint8(np.round(x * 255.0))


def normalize_to_diffusion(x: jax.Array) -> jax.Array:
    """[0,1] -> [-1,1] (VaeImageProcessor.preprocess normalisation)."""
    return x * 2.0 - 1.0


def denormalize_from_diffusion(x: jax.Array) -> jax.Array:
    """[-1,1] -> [0,1], clipped (VaeImageProcessor.postprocess)."""
    return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)


def resize_lanczos(img, size: Tuple[int, int]):
    """LANCZOS upscale via PIL (host-side, mirrors `test.py:125`).

    img: HWC uint8 numpy; size: (width, height)."""
    from PIL import Image

    return np.array(Image.fromarray(img).resize(size, Image.LANCZOS))


# ---------------------------------------------------------------------------
# HDR effect: Mertens exposure fusion over 9 synthetic exposures
# (`image_process.py:38-79`; OpenCV MergeMertens reimplemented in JAX).
# ---------------------------------------------------------------------------

def _gaussian_kernel_5() -> np.ndarray:
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    return np.outer(k, k).astype(np.float32)


def _blur5(x: jax.Array) -> jax.Array:
    """5x5 Gaussian blur, reflect padding, depthwise. x: [B, H, W, C]."""
    c = x.shape[-1]
    kern = jnp.asarray(_gaussian_kernel_5())[:, :, None, None]
    kern = jnp.tile(kern, (1, 1, 1, c))
    padded = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        padded, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _downsample(x: jax.Array) -> jax.Array:
    return _blur5(x)[:, ::2, ::2, :]


def _upsample(x: jax.Array, shape_hw: Tuple[int, int]) -> jax.Array:
    b, h, w, c = x.shape
    up = jnp.zeros((b, h * 2, w * 2, c), x.dtype).at[:, ::2, ::2, :].set(x)
    up = _blur5(up) * 4.0
    return up[:, : shape_hw[0], : shape_hw[1], :]


def _pyramid_levels(h: int, w: int, max_levels: int = 8) -> int:
    lv = 1
    while min(h, w) >= 16 and lv < max_levels:
        h, w = (h + 1) // 2, (w + 1) // 2
        lv += 1
    return lv


def mertens_fusion(images: jax.Array, contrast_w=1.0, sat_w=1.0, expo_w=1.0) -> jax.Array:
    """Exposure fusion (Mertens et al. 2007) over [N, H, W, 3] float images in
    [0,1]. Laplacian-pyramid blend with quality weights; matches OpenCV
    MergeMertens' algorithm."""
    n, h, w, _ = images.shape
    gray = jnp.einsum("nhwc,c->nhw", images, jnp.asarray([0.299, 0.587, 0.114]))

    # contrast: |laplacian| of grayscale
    lap_k = jnp.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    gpad = jnp.pad(gray[..., None], ((0, 0), (1, 1), (1, 1), (0, 0)), "reflect")
    contrast = jnp.abs(
        jax.lax.conv_general_dilated(
            gpad, lap_k[:, :, None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[..., 0]
    )
    # saturation: std across channels
    mean_c = jnp.mean(images, axis=-1)
    sat = jnp.sqrt(jnp.mean(jnp.square(images - mean_c[..., None]), axis=-1))
    # well-exposedness: product over channels of gaussian around 0.5
    expo = jnp.prod(jnp.exp(-((images - 0.5) ** 2) / (2 * 0.2 ** 2)), axis=-1)

    weights = (
        (contrast + 1e-12) ** contrast_w
        * (sat + 1e-12) ** sat_w
        * (expo + 1e-12) ** expo_w
    ) + 1e-12
    weights = weights / jnp.sum(weights, axis=0, keepdims=True)  # [N, H, W]

    levels = _pyramid_levels(h, w)

    # Gaussian pyramid of weights; Laplacian pyramid of images
    w_pyr = [weights[..., None]]
    img_gauss = [images]
    for _ in range(levels - 1):
        w_pyr.append(_downsample(w_pyr[-1]))
        img_gauss.append(_downsample(img_gauss[-1]))
    img_lap = []
    for lv in range(levels - 1):
        hi = img_gauss[lv]
        up = _upsample(img_gauss[lv + 1], hi.shape[1:3])
        img_lap.append(hi - up)
    img_lap.append(img_gauss[-1])

    blended = [
        jnp.sum(img_lap[lv] * w_pyr[lv], axis=0, keepdims=False)[None]
        for lv in range(levels)
    ]
    out = blended[-1]
    for lv in range(levels - 2, -1, -1):
        out = _upsample(out, blended[lv].shape[1:3]) + blended[lv]
    return jnp.clip(out[0], 0.0, 1.0)


def create_hdr_effect(image: np.ndarray, hdr: float) -> np.ndarray:
    """HDR effect over 9 scaled exposures (`image_process.py:38-79`).

    image: HWC uint8; hdr in [0, 1]; returns HWC uint8."""
    if hdr == 0:
        return image
    factors = [
        1.0 - 0.9 * hdr, 1.0 - 0.7 * hdr, 1.0 - 0.45 * hdr, 1.0 - 0.25 * hdr,
        1.0, 1.0 + 0.2 * hdr, 1.0 + 0.4 * hdr, 1.0 + 0.6 * hdr, 1.0 + 0.8 * hdr,
    ]
    base = image.astype(np.float32)
    exposures = np.stack(
        [np.clip(base * f, 0, 255) / 255.0 for f in factors], axis=0
    )
    fused = mertens_fusion(jnp.asarray(exposures))
    return np.uint8(np.clip(np.asarray(fused) * 255.0, 0, 255))
