"""Degradation engine tests: kernels, noise, JPEG, end-to-end pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faithdiff_tpu.data.degradation import (DegradationConfig, KernelConfig,
                                            RealESRGANDegradation,
                                            add_gaussian_noise,
                                            add_poisson_noise,
                                            bivariate_gaussian,
                                            circular_lowpass_kernel,
                                            filter2d, resize,
                                            sample_degradation_kernel,
                                            sample_final_sinc_kernel)
from faithdiff_tpu.data.jpeg import jpeg_compress, pad_to_16, quality_to_factor


def test_gaussian_kernel_properties():
    k = bivariate_gaussian(21, 2.0, isotropic=True)
    assert k.shape == (21, 21)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[10, 10] == k.max()
    # isotropy
    np.testing.assert_allclose(k, k.T, atol=1e-12)


def test_sinc_kernel_matches_scipy_bessel():
    k = circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    assert k.shape == (21, 21)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-5)


def test_sampled_kernels_are_normalized():
    rng = np.random.default_rng(0)
    for _ in range(20):
        k = sample_degradation_kernel(rng, KernelConfig())
        assert k.shape == (21, 21)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-4)
    s = sample_final_sinc_kernel(rng, final_sinc_prob=0.0)
    assert s[10, 10] == 1.0 and s.sum() == 1.0  # identity pulse


def test_filter2d_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    kern = rng.random((2, 5, 5)).astype(np.float32)
    kern /= kern.sum(axis=(1, 2), keepdims=True)
    out = filter2d(jnp.asarray(img), jnp.asarray(kern))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tk = torch.from_numpy(kern)
    k = tk.shape[-1]
    ref = []
    for i in range(2):
        x = F.pad(timg[i:i + 1], (k // 2,) * 4, mode="reflect")
        w = tk[i].view(1, 1, k, k).repeat(3, 1, 1, 1)
        ref.append(F.conv2d(x, w, groups=3))
    ref = torch.cat(ref).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_gaussian_noise_statistics():
    img = jnp.full((4, 32, 32, 3), 0.5)
    out = add_gaussian_noise(jax.random.PRNGKey(0), img,
                             sigma_range=(10, 10), gray_prob=0.0)
    noise = np.asarray(out) - 0.5
    assert 0.5 * 10 / 255 < noise.std() < 1.5 * 10 / 255


def test_gray_noise_is_channel_shared():
    img = jnp.full((4, 32, 32, 3), 0.5)
    out = add_gaussian_noise(jax.random.PRNGKey(1), img,
                             sigma_range=(10, 10), gray_prob=1.0)
    noise = np.asarray(out) - 0.5
    np.testing.assert_allclose(noise[..., 0], noise[..., 1], atol=1e-7)


def test_poisson_noise_finite_and_scaled():
    img = jnp.full((2, 32, 32, 3), 0.5)
    out = add_poisson_noise(jax.random.PRNGKey(2), img,
                            scale_range=(1.0, 1.0), gray_prob=0.0)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out - img).mean()) > 1e-4


def test_quality_to_factor():
    np.testing.assert_allclose(float(quality_to_factor(jnp.asarray(50.0))), 1.0)
    assert float(quality_to_factor(jnp.asarray(10.0))) == 5.0
    assert float(quality_to_factor(jnp.asarray(100.0))) == 0.0


def test_jpeg_identity_at_max_quality():
    # use a luma-only image: 4:2:0 chroma subsampling is lossy by design on
    # high-frequency chroma, but q=100 luma must be near-lossless
    rng = np.random.default_rng(3)
    g = jnp.tile(jnp.asarray(rng.random((1, 32, 32, 1)), jnp.float32),
                 (1, 1, 1, 3))
    out = jpeg_compress(g, jnp.asarray([100.0]))
    assert float(jnp.abs(out - g).mean()) < 0.005


def test_jpeg_degrades_at_low_quality():
    rng = np.random.default_rng(4)
    # luma-only: isolates quantisation loss from fixed 4:2:0 chroma loss
    img = jnp.tile(jnp.asarray(rng.random((1, 32, 32, 1)), jnp.float32),
                   (1, 1, 1, 3))
    hi = jpeg_compress(img, jnp.asarray([95.0]))
    lo = jpeg_compress(img, jnp.asarray([10.0]))
    err_hi = float(jnp.abs(hi - img).mean())
    err_lo = float(jnp.abs(lo - img).mean())
    assert err_lo > err_hi * 1.5
    assert 0 <= float(lo.min()) and float(lo.max()) <= 1


def test_jpeg_matches_pil_roundtrip_closely():
    """Our JPEG sim vs actual libjpeg (PIL) at the same quality: outputs
    should agree closely (both implement the same standard)."""
    from PIL import Image
    import io

    rng = np.random.default_rng(5)
    # smooth image -> less aliasing ambiguity
    base = rng.random((8, 8, 3)).astype(np.float32)
    img = np.asarray(jax.image.resize(jnp.asarray(base), (64, 64, 3), "cubic"))
    img = np.clip(img, 0, 1)

    ours = np.asarray(jpeg_compress(jnp.asarray(img)[None],
                                    jnp.asarray([75.0])))[0]
    buf = io.BytesIO()
    Image.fromarray(np.uint8(img * 255)).save(buf, "JPEG", quality=75)
    ref = np.asarray(Image.open(buf)).astype(np.float32) / 255.0
    # mean abs difference between two JPEG implementations at q75
    # (libjpeg uses smooth chroma upsampling; ours/basicsr use nearest, so
    # a small systematic gap remains)
    assert np.abs(ours - ref).mean() < 0.03
    # both must distort the source comparably
    assert np.abs(ours - img).mean() < 2.0 * np.abs(ref - img).mean()


def test_pad_to_16():
    x = jnp.ones((1, 30, 33, 3))
    padded, h, w = pad_to_16(x)
    assert padded.shape == (1, 32, 48, 3)
    assert (h, w) == (30, 33)


def test_full_degradation_pipeline():
    deg = RealESRGANDegradation(DegradationConfig(), seed=0)
    rng = np.random.default_rng(6)
    gt = jnp.asarray(rng.random((2, 128, 128, 3)), jnp.float32)
    for i in range(3):  # different random plans
        gt_out, lq = deg(jax.random.PRNGKey(i), gt)
        assert gt_out.shape == (2, 128, 128, 3)
        assert lq.shape == (2, 32, 32, 3)
        lq_np = np.asarray(lq)
        assert np.isfinite(lq_np).all()
        assert 0.0 <= lq_np.min() and lq_np.max() <= 1.0
        # degraded-downscaled image must differ from a clean downscale
        clean_small = np.asarray(resize(gt, (32, 32), "bilinear"))
        assert np.abs(lq_np - clean_small).mean() > 1e-3


# ---------------------------------------------------------------------------
# color jitter (`realesrgan.py:288-295` / basicsr color_jitter_pt semantics)
# ---------------------------------------------------------------------------

def test_hsv_roundtrip_identity():
    from faithdiff_tpu.data.degradation import _hsv_to_rgb, _rgb_to_hsv

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)))
    h, s, v = _rgb_to_hsv(img)
    back = _hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_adjust_hue_matches_colorsys():
    import colorsys

    from faithdiff_tpu.data.degradation import adjust_hue

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, 4, 5, 3))
    shift = 0.07
    got = np.asarray(adjust_hue(jnp.asarray(img), shift))
    for y in range(4):
        for x in range(5):
            r, g, b = img[0, y, x]
            h, l_s, v = colorsys.rgb_to_hsv(r, g, b)
            want = colorsys.hsv_to_rgb((h + shift) % 1.0, l_s, v)
            np.testing.assert_allclose(got[0, y, x], want, atol=1e-5)


def test_adjust_brightness_contrast_saturation():
    from faithdiff_tpu.data.degradation import (adjust_brightness,
                                                adjust_contrast,
                                                adjust_saturation)

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 6, 6, 3)))
    np.testing.assert_allclose(
        np.asarray(adjust_brightness(img, 0.5)), np.asarray(img) * 0.5,
        atol=1e-6)
    # contrast factor 1 and saturation factor 1 are identity
    np.testing.assert_allclose(
        np.asarray(adjust_contrast(img, 1.0)), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(adjust_saturation(img, 1.0)), np.asarray(img), atol=1e-6)
    # saturation factor 0 is grayscale
    g = np.asarray(adjust_saturation(img, 0.0))
    assert np.allclose(g[..., 0], g[..., 1], atol=1e-6)
    assert np.allclose(g[..., 1], g[..., 2], atol=1e-6)


def test_color_jitter_prob_wired_into_pipeline():
    """color_jitter_prob=1 must change the LQ output vs prob=0 under the
    same RNG stream position at the jitter branch (round-1 flag-lies fix)."""
    hr = np.random.default_rng(3).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)

    def run(prob):
        cfg = DegradationConfig(
            scale=2, gray_prob=0.0, color_jitter_prob=prob,
            final_sinc_prob=0.0)
        deg = RealESRGANDegradation(cfg, seed=7)
        _, lq = deg(jax.random.PRNGKey(7), jnp.asarray(hr))
        return np.asarray(lq)

    a, b = run(0.0), run(1.0)
    assert a.shape == b.shape
    assert not np.allclose(a, b)
