"""Color-fix tests vs an independent torch mirror of the published algorithm
(`/root/reference/utils/color_fix.py`, from sd-webui-stablesr)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from faithdiff_tpu.utils.color_fix import (
    adain_color_fix,
    adaptive_instance_normalization,
    calc_mean_std,
    wavelet_blur,
    wavelet_color_fix,
    wavelet_reconstruction,
)


def _torch_wavelet_blur(image, radius):
    kernel_vals = [
        [0.0625, 0.125, 0.0625],
        [0.125, 0.25, 0.125],
        [0.0625, 0.125, 0.0625],
    ]
    kernel = torch.tensor(kernel_vals, dtype=image.dtype)[None, None]
    kernel = kernel.repeat(3, 1, 1, 1)
    image = F.pad(image, (radius, radius, radius, radius), mode="replicate")
    return F.conv2d(image, kernel, groups=3, dilation=radius)


def _torch_wavelet_decomposition(image, levels=5):
    high_freq = torch.zeros_like(image)
    for i in range(levels):
        radius = 2 ** i
        low_freq = _torch_wavelet_blur(image, radius)
        high_freq = high_freq + (image - low_freq)
        image = low_freq
    return high_freq, low_freq


def _rand_img(seed, h=64, w=64):
    rng = np.random.default_rng(seed)
    return rng.random((1, h, w, 3)).astype(np.float32)


def test_wavelet_blur_matches_torch():
    x = _rand_img(0)
    for radius in (1, 2, 4):
        out = wavelet_blur(jnp.asarray(x), radius)
        ref = _torch_wavelet_blur(
            torch.from_numpy(x).permute(0, 3, 1, 2), radius
        ).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_wavelet_reconstruction_matches_torch():
    content = _rand_img(1)
    style = _rand_img(2)
    out = wavelet_reconstruction(jnp.asarray(content), jnp.asarray(style))
    c_high, _ = _torch_wavelet_decomposition(
        torch.from_numpy(content).permute(0, 3, 1, 2)
    )
    _, s_low = _torch_wavelet_decomposition(
        torch.from_numpy(style).permute(0, 3, 1, 2)
    )
    ref = (c_high + s_low).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_adain_matches_torch():
    content = _rand_img(3)
    style = _rand_img(4)
    out = adaptive_instance_normalization(jnp.asarray(content), jnp.asarray(style))

    def t_mean_std(feat, eps=1e-5):
        b, c = feat.shape[:2]
        var = feat.reshape(b, c, -1).var(dim=2) + eps
        std = var.sqrt().reshape(b, c, 1, 1)
        mean = feat.reshape(b, c, -1).mean(dim=2).reshape(b, c, 1, 1)
        return mean, std

    tc = torch.from_numpy(content).permute(0, 3, 1, 2)
    ts = torch.from_numpy(style).permute(0, 3, 1, 2)
    sm, ss = t_mean_std(ts)
    cm, cs = t_mean_std(tc)
    ref = (((tc - cm) / cs) * ss + sm).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_color_fix_output_range():
    t = _rand_img(5)
    s = _rand_img(6)
    for fn in (wavelet_color_fix, adain_color_fix):
        out = np.asarray(fn(jnp.asarray(t), jnp.asarray(s)))
        assert out.min() >= 0.0 and out.max() <= 1.0


def test_wavelet_fix_transfers_low_freq_color():
    # a strongly green source should pull the output toward green
    target = np.full((1, 32, 32, 3), 0.5, np.float32)
    source = np.zeros((1, 32, 32, 3), np.float32)
    source[..., 1] = 0.9
    out = np.asarray(wavelet_color_fix(jnp.asarray(target), jnp.asarray(source)))
    assert out[..., 1].mean() > out[..., 0].mean() + 0.5


def test_streaming_color_fix_matches_full():
    """Tile-streamed fix == one-fusion fix exactly (wavelet halo proof),
    including edge tiles, adain global stats, denorm and uint8 paths."""
    import jax.numpy as jnp

    from faithdiff_tpu.utils.color_fix import (adain_color_fix,
                                               streaming_color_fix,
                                               wavelet_color_fix)

    rng = np.random.default_rng(0)
    h, w = 150, 98                     # non-square, non-multiple of tile
    tgt = rng.uniform(size=(1, h, w, 3)).astype(np.float32)
    src = rng.uniform(size=(h, w, 3)).astype(np.float32)

    full_w = np.asarray(wavelet_color_fix(jnp.asarray(tgt), jnp.asarray(src)[None]))[0]
    got_w = streaming_color_fix(jnp.asarray(tgt), src, "wavelet", tile=64)
    np.testing.assert_allclose(got_w, full_w, atol=1e-6)

    full_a = np.asarray(adain_color_fix(jnp.asarray(tgt), jnp.asarray(src)[None]))[0]
    got_a = streaming_color_fix(jnp.asarray(tgt), src, "adain", tile=64)
    np.testing.assert_allclose(got_a, full_a, atol=1e-5)

    # nofix + denorm + uint8: quantized clip((x/2+.5))
    tgt2 = (tgt * 2.0 - 1.0).astype(np.float32)
    got_u = streaming_color_fix(jnp.asarray(tgt2), src, "nofix", tile=64,
                                to_uint8=True, denorm=True)
    want_u = np.round(np.clip(tgt2[0] / 2 + 0.5, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(got_u, want_u)
