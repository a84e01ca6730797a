"""Real-ESRGAN-style two-stage degradation engine.

Capability-equivalent to the reference `RealESRGAN_degradation`
(`/root/reference/dataloader/realesrgan.py:53-305`) + its basicsr kernel
helpers, reimplemented for TPU:

- blur-kernel *synthesis* is host-side numpy per sample (tiny 21x21 arrays,
  branchy math — wrong fit for XLA), exactly the basicsr families:
  iso/aniso Gaussian, generalized Gaussian, plateau, circular sinc
- the *apply* path (filter2D, resizes, noise, JPEG) is batched JAX, jittable
  and vmappable on device; randomness is explicit `jax.random` keys
- config values mirror `/root/reference/dataloader/train_kernel.yml`

Output pair (GT [0,1], LQ [0,1]) with LQ at 1/4 scale (scale_final=4,
`realesrgan.py:203`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special as _sp_special  # bessel j1 for sinc kernels

from .jpeg import jpeg_compress, pad_to_16


# ---------------------------------------------------------------------------
# kernel synthesis (host-side numpy; basicsr.degradations equivalents)
# ---------------------------------------------------------------------------

def _mesh(kernel_size: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    ax = np.arange(kernel_size) - kernel_size // 2
    xx, yy = np.meshgrid(ax, ax)
    return xx, yy, np.stack([xx, yy], -1)[..., None]


def _sigma_matrix(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    d = np.array([[sig_x ** 2, 0], [0, sig_y ** 2]])
    u = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def bivariate_gaussian(kernel_size, sig_x, sig_y=None, theta=0.0,
                       grid=None, isotropic=True) -> np.ndarray:
    xx, yy, xy = _mesh(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x ** 2, 0], [0, sig_x ** 2]])
    else:
        sigma = _sigma_matrix(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    kernel = np.exp(-0.5 * np.squeeze(xy.transpose(0, 1, 3, 2) @ inv @ xy))
    return kernel / kernel.sum()


def bivariate_generalized_gaussian(kernel_size, sig_x, sig_y, theta, beta,
                                   isotropic=True) -> np.ndarray:
    xx, yy, xy = _mesh(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x ** 2, 0], [0, sig_x ** 2]])
    else:
        sigma = _sigma_matrix(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    quad = np.squeeze(xy.transpose(0, 1, 3, 2) @ inv @ xy)
    kernel = np.exp(-0.5 * np.power(quad, beta))
    return kernel / kernel.sum()


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta,
                      isotropic=True) -> np.ndarray:
    xx, yy, xy = _mesh(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x ** 2, 0], [0, sig_x ** 2]])
    else:
        sigma = _sigma_matrix(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    quad = np.squeeze(xy.transpose(0, 1, 3, 2) @ inv @ xy)
    kernel = 1.0 / (np.power(quad, beta) + 1)
    return kernel / kernel.sum()


def circular_lowpass_kernel(omega_c: float, kernel_size: int,
                            pad_to: int = 0) -> np.ndarray:
    """2D sinc filter (basicsr `circular_lowpass_kernel` behavior)."""
    assert kernel_size % 2 == 1
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2
    xx, yy = np.meshgrid(ax, ax)
    r = np.sqrt(xx ** 2 + yy ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        kernel = omega_c * _sp_special.j1(omega_c * r) / (2 * np.pi * r)
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = \
        omega_c ** 2 / (4 * np.pi)
    kernel = kernel / kernel.sum()
    if pad_to > kernel_size:
        pad = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad, pad), (pad, pad)))
    return kernel.astype(np.float32)


_KERNEL_RANGE = [2 * v + 1 for v in range(3, 11)]  # 7..21


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Mirrors `train_kernel.yml:24-42`."""

    kernel_list: Tuple[str, ...] = (
        "iso", "aniso", "generalized_iso", "generalized_aniso",
        "plateau_iso", "plateau_aniso")
    kernel_prob: Tuple[float, ...] = (0.45, 0.25, 0.12, 0.03, 0.12, 0.03)
    sinc_prob: float = 0.1
    blur_sigma: Tuple[float, float] = (0.2, 3.0)
    betag_range: Tuple[float, float] = (0.5, 4.0)
    betap_range: Tuple[float, float] = (1.0, 2.0)


def random_mixed_kernel(rng: np.random.Generator, cfg: KernelConfig,
                        kernel_size: int) -> np.ndarray:
    """basicsr `random_mixed_kernels` for one sample."""
    ktype = rng.choice(list(cfg.kernel_list), p=np.asarray(cfg.kernel_prob))
    sig_x = rng.uniform(*cfg.blur_sigma)
    sig_y = rng.uniform(*cfg.blur_sigma)
    theta = rng.uniform(-math.pi, math.pi)
    if ktype == "iso":
        return bivariate_gaussian(kernel_size, sig_x, isotropic=True)
    if ktype == "aniso":
        return bivariate_gaussian(kernel_size, sig_x, sig_y, theta,
                                  isotropic=False)
    if ktype == "generalized_iso":
        beta = rng.uniform(*cfg.betag_range)
        return bivariate_generalized_gaussian(
            kernel_size, sig_x, sig_y, theta, beta, isotropic=True)
    if ktype == "generalized_aniso":
        beta = rng.uniform(*cfg.betag_range)
        return bivariate_generalized_gaussian(
            kernel_size, sig_x, sig_y, theta, beta, isotropic=False)
    if ktype == "plateau_iso":
        beta = rng.uniform(*cfg.betap_range)
        return bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta,
                                 isotropic=True)
    beta = rng.uniform(*cfg.betap_range)
    return bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta,
                             isotropic=False)


def sample_degradation_kernel(rng: np.random.Generator,
                              cfg: KernelConfig) -> np.ndarray:
    """One stage-1/2 blur kernel, padded to 21x21
    (`realesrgan.py:129-174`)."""
    kernel_size = int(rng.choice(_KERNEL_RANGE))
    if rng.uniform() < cfg.sinc_prob:
        # sinc cutoff range depends on kernel size (`realesrgan.py:134-137`)
        if kernel_size < 13:
            omega_c = rng.uniform(np.pi / 3, np.pi)
        else:
            omega_c = rng.uniform(np.pi / 5, np.pi)
        kernel = circular_lowpass_kernel(omega_c, kernel_size, pad_to=0)
    else:
        kernel = random_mixed_kernel(rng, cfg, kernel_size)
    pad = (21 - kernel_size) // 2
    return np.pad(kernel, ((pad, pad), (pad, pad))).astype(np.float32)


def sample_final_sinc_kernel(rng: np.random.Generator,
                             final_sinc_prob: float = 0.8) -> np.ndarray:
    """Final sinc kernel or identity pulse (`realesrgan.py:176-183`)."""
    if rng.uniform() < final_sinc_prob:
        kernel_size = int(rng.choice(_KERNEL_RANGE))
        omega_c = rng.uniform(np.pi / 3, np.pi)
        return circular_lowpass_kernel(omega_c, kernel_size, pad_to=21)
    pulse = np.zeros((21, 21), np.float32)
    pulse[10, 10] = 1.0
    return pulse


# ---------------------------------------------------------------------------
# on-device apply ops
# ---------------------------------------------------------------------------

def filter2d(image: jax.Array, kernel: jax.Array) -> jax.Array:
    """Per-sample 2D filtering with reflect padding (basicsr `filter2D`).

    image: [B, H, W, C]; kernel: [B, k, k] (one kernel per sample)."""
    b, h, w, c = image.shape
    k = kernel.shape[-1]
    pad = k // 2
    x = jnp.pad(image, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                mode="reflect")
    # batch-grouped conv: fold batch into feature groups
    x = x.transpose(1, 2, 0, 3).reshape(1, h + 2 * pad, w + 2 * pad, b * c)
    kern = jnp.repeat(kernel[:, :, :, None], c, axis=-1)  # [B, k, k, C]
    kern = kern.transpose(1, 2, 0, 3).reshape(k, k, 1, b * c)
    out = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


def resize(image: jax.Array, size: Tuple[int, int], method: str) -> jax.Array:
    """Resize [B, H, W, C]; `method` in {area, bilinear, bicubic}."""
    b, _, _, c = image.shape
    shape = (b, size[0], size[1], c)
    if method == "area":
        # torch 'area' == average pooling; antialiased linear resize is the
        # standard JAX equivalent for arbitrary ratios
        return jax.image.resize(image, shape, method="linear", antialias=True)
    if method == "bilinear":
        return jax.image.resize(image, shape, method="linear", antialias=False)
    if method == "bicubic":
        return jax.image.resize(image, shape, method="cubic", antialias=False)
    raise ValueError(method)


def add_gaussian_noise(key, image, sigma_range=(1, 15), gray_prob=0.4,
                       clip=True):
    """basicsr `random_add_gaussian_noise_pt`: per-sample sigma/255, random
    gray (channel-shared) noise."""
    b = image.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    sigma = jax.random.uniform(
        k1, (b, 1, 1, 1), minval=sigma_range[0], maxval=sigma_range[1]) / 255.0
    gray = jax.random.uniform(k2, (b, 1, 1, 1)) < gray_prob
    noise_c = jax.random.normal(k3, image.shape, jnp.float32)
    noise_g = jnp.broadcast_to(
        jnp.mean(noise_c, axis=-1, keepdims=True) * 0 + noise_c[..., :1],
        image.shape)
    noise = jnp.where(gray, noise_g, noise_c) * sigma
    out = image + noise
    return jnp.clip(out, 0.0, 1.0) if clip else out


def add_poisson_noise(key, image, scale_range=(0.05, 2.0), gray_prob=0.4,
                      clip=True):
    """basicsr `random_add_poisson_noise_pt` semantics: Poisson on a
    quantised image with per-sample scale; gray variant uses the gray image's
    statistics shared across channels."""
    b = image.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(
        k1, (b, 1, 1, 1), minval=scale_range[0], maxval=scale_range[1])
    gray = jax.random.uniform(k2, (b, 1, 1, 1)) < gray_prob

    def poisson_noise(img, key):
        img_c = jnp.clip(img, 0.0, 1.0)
        # vals = 10^ceil(log10(unique count)) ~ dynamic; basicsr uses the
        # count of unique values — approximate with 256 levels (uint8 input)
        vals = 256.0
        sampled = jax.random.poisson(key, img_c * vals) / vals
        return sampled - img_c

    gray_img = jnp.mean(image, axis=-1, keepdims=True)
    noise_color = poisson_noise(image, k3)
    noise_gray = jnp.broadcast_to(poisson_noise(gray_img, k3), image.shape)
    noise = jnp.where(gray, noise_gray, noise_color) * scale
    out = image + noise
    return jnp.clip(out, 0.0, 1.0) if clip else out


def rgb_to_grayscale(image: jax.Array) -> jax.Array:
    w = jnp.asarray([0.299, 0.587, 0.114])
    g = jnp.einsum("bhwc,c->bhw", image, w)[..., None]
    return jnp.broadcast_to(g, image.shape)


# ---------------------------------------------------------------------------
# color jitter (torchvision-functional semantics, as used by basicsr's
# `color_jitter_pt` in the reference second stage, `realesrgan.py:288-295`)
# ---------------------------------------------------------------------------

def adjust_brightness(image: jax.Array, factor: float) -> jax.Array:
    return jnp.clip(image * factor, 0.0, 1.0)


def adjust_contrast(image: jax.Array, factor: float) -> jax.Array:
    mean = jnp.mean(rgb_to_grayscale(image)[..., :1], axis=(1, 2, 3),
                    keepdims=True)
    return jnp.clip(factor * image + (1.0 - factor) * mean, 0.0, 1.0)


def adjust_saturation(image: jax.Array, factor: float) -> jax.Array:
    gray = rgb_to_grayscale(image)
    return jnp.clip(factor * image + (1.0 - factor) * gray, 0.0, 1.0)


def _rgb_to_hsv(image: jax.Array):
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    maxc = jnp.max(image, axis=-1)
    minc = jnp.min(image, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h: jax.Array, s: jax.Array, v: jax.Array) -> jax.Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(image: jax.Array, factor: float) -> jax.Array:
    """Shift hue by `factor` (in turns, [-0.5, 0.5])."""
    h, s, v = _rgb_to_hsv(jnp.clip(image, 0.0, 1.0))
    return _hsv_to_rgb((h + factor) % 1.0, s, v)


def color_jitter(image: jax.Array, rng: np.random.Generator,
                 brightness=(0.5, 1.5), contrast=(0.5, 1.5),
                 saturation=(0.0, 1.5), hue=(-0.1, 0.1)) -> jax.Array:
    """Random-order brightness/contrast/saturation/hue jitter with factors
    drawn on the host (basicsr `color_jitter_pt` semantics)."""
    ops = {
        0: lambda im: adjust_brightness(im, rng.uniform(*brightness)),
        1: lambda im: adjust_contrast(im, rng.uniform(*contrast)),
        2: lambda im: adjust_saturation(im, rng.uniform(*saturation)),
        3: lambda im: adjust_hue(im, rng.uniform(*hue)),
    }
    for fn_id in rng.permutation(4):
        image = ops[int(fn_id)](image)
    return image


# ---------------------------------------------------------------------------
# full two-stage pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DegradationConfig:
    """Mirrors `/root/reference/dataloader/train_kernel.yml`."""

    scale: int = 4
    resize_prob: Tuple[float, float, float] = (0.2, 0.7, 0.1)
    resize_range: Tuple[float, float] = (0.3, 1.5)
    gaussian_noise_prob: float = 0.5
    noise_range: Tuple[float, float] = (1, 15)
    poisson_scale_range: Tuple[float, float] = (0.05, 2.0)
    gray_noise_prob: float = 0.4
    jpeg_range: Tuple[float, float] = (60, 95)
    second_blur_prob: float = 0.5
    resize_prob2: Tuple[float, float, float] = (0.3, 0.4, 0.3)
    resize_range2: Tuple[float, float] = (0.6, 1.2)
    gaussian_noise_prob2: float = 0.5
    noise_range2: Tuple[float, float] = (1, 12)
    poisson_scale_range2: Tuple[float, float] = (0.05, 1.0)
    gray_noise_prob2: float = 0.4
    jpeg_range2: Tuple[float, float] = (60, 100)
    gray_prob: float = 0.0
    color_jitter_prob: float = 0.0
    kernel1: KernelConfig = KernelConfig()
    kernel2: KernelConfig = KernelConfig(blur_sigma=(0.2, 1.5))
    final_sinc_prob: float = 0.8


class RealESRGANDegradation:
    """Two-stage degradation: host-side random plan + on-device batched ops.

    The stage structure mirrors `degrade_process` (`realesrgan.py:190-305`):
      blur -> random resize -> noise -> JPEG  (stage 1)
      [blur] -> resize -> noise -> {JPEG + resize-back+sinc in random order}
    Shape-changing choices (resize scales, op order) are host-side ints so
    each distinct plan compiles once; everything pixel-touching runs on
    device.
    """

    def __init__(self, config: DegradationConfig = DegradationConfig(),
                 seed: int = 0):
        self.cfg = config
        self.rng = np.random.default_rng(seed)

    def _choice(self, probs):
        return int(self.rng.choice(len(probs), p=np.asarray(probs) / np.sum(probs)))

    def __call__(
        self, key: jax.Array, gt: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """gt: [B, H, W, 3] in [0, 1]. Returns (gt, lq) with lq at 1/scale."""
        cfg = self.cfg
        rng = self.rng
        b, ori_h, ori_w, _ = gt.shape
        keys = jax.random.split(key, 8)

        kernel1 = jnp.asarray(np.stack(
            [sample_degradation_kernel(rng, cfg.kernel1) for _ in range(b)]))
        kernel2 = jnp.asarray(np.stack(
            [sample_degradation_kernel(rng, cfg.kernel2) for _ in range(b)]))
        sinc = jnp.asarray(np.stack(
            [sample_final_sinc_kernel(rng, cfg.final_sinc_prob)
             for _ in range(b)]))

        out = filter2d(gt, kernel1)

        updown = self._choice(cfg.resize_prob)
        if updown == 0:
            scale = rng.uniform(1, cfg.resize_range[1])
        elif updown == 1:
            scale = rng.uniform(cfg.resize_range[0], 1)
        else:
            scale = 1.0
        mode = ["area", "bilinear", "bicubic"][int(rng.integers(3))]
        out = resize(out, (max(int(ori_h * scale), 8),
                           max(int(ori_w * scale), 8)), mode)

        if rng.uniform() < cfg.gaussian_noise_prob:
            out = add_gaussian_noise(keys[0], out, cfg.noise_range,
                                     cfg.gray_noise_prob)
        else:
            out = add_poisson_noise(keys[1], out, cfg.poisson_scale_range,
                                    cfg.gray_noise_prob)

        quality = jax.random.uniform(
            keys[2], (b,), minval=cfg.jpeg_range[0], maxval=cfg.jpeg_range[1])
        padded, h0, w0 = pad_to_16(jnp.clip(out, 0, 1))
        out = jpeg_compress(padded, quality)[:, :h0, :w0]

        # stage 2
        if rng.uniform() < cfg.second_blur_prob:
            out = filter2d(out, kernel2)
        updown = self._choice(cfg.resize_prob2)
        if updown == 0:
            scale = rng.uniform(1, cfg.resize_range2[1])
        elif updown == 1:
            scale = rng.uniform(cfg.resize_range2[0], 1)
        else:
            scale = 1.0
        mode = ["area", "bilinear", "bicubic"][int(rng.integers(3))]
        out = resize(out, (max(int(ori_h / cfg.scale * scale), 8),
                           max(int(ori_w / cfg.scale * scale), 8)), mode)

        if rng.uniform() < cfg.gaussian_noise_prob2:
            out = add_gaussian_noise(keys[3], out, cfg.noise_range2,
                                     cfg.gray_noise_prob2)
        else:
            out = add_poisson_noise(keys[4], out, cfg.poisson_scale_range2,
                                    cfg.gray_noise_prob2)

        quality = jax.random.uniform(
            keys[5], (b,), minval=cfg.jpeg_range2[0],
            maxval=cfg.jpeg_range2[1])
        final_size = (ori_h // cfg.scale, ori_w // cfg.scale)
        mode = ["area", "bilinear", "bicubic"][int(rng.integers(3))]
        if rng.uniform() < 0.5:
            out = resize(out, final_size, mode)
            out = filter2d(out, sinc)
            padded, h0, w0 = pad_to_16(jnp.clip(out, 0, 1))
            out = jpeg_compress(padded, quality)[:, :h0, :w0]
        else:
            padded, h0, w0 = pad_to_16(jnp.clip(out, 0, 1))
            out = jpeg_compress(padded, quality)[:, :h0, :w0]
            out = resize(out, final_size, mode)
            out = filter2d(out, sinc)

        if rng.uniform() < cfg.gray_prob:
            out = rgb_to_grayscale(out)

        # brightness/contrast/saturation/hue jitter (`realesrgan.py:288-295`)
        if rng.uniform() < cfg.color_jitter_prob:
            out = color_jitter(jnp.clip(out, 0.0, 1.0), rng)

        # clamp + uint8 round (`realesrgan.py:303`)
        lq = jnp.clip(jnp.round(jnp.clip(out, 0, 1) * 255.0), 0, 255) / 255.0
        return gt, lq
