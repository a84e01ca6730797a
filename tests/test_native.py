"""Native C++ IO library tests (built on demand; falls back to PIL/numpy)."""
import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from faithdiff_tpu.native import (decode_batch, decode_resize,
                                  native_available, tile_merge_host)
from faithdiff_tpu.pipelines.tiling import (compute_tile_layout,
                                            gaussian_tile_weights)


@pytest.fixture(scope="module")
def img_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, ext in enumerate(["png", "jpg", "png"]):
        arr = rng.integers(0, 255, (48, 64, 3), np.uint8)
        p = str(d / f"img{i}.{ext}")
        Image.fromarray(arr).save(p)
        paths.append((p, arr))
    return paths


def test_native_builds():
    assert native_available(), "native lib should build in this image"


def test_decode_resize_matches_pil(img_files):
    path, arr = img_files[0]  # png: lossless
    out = decode_resize(path, 64, 48)  # same size -> no resampling error
    ref = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=1 / 255.0 + 1e-6)


def test_decode_resize_downscale(img_files):
    path, _ = img_files[0]
    out = decode_resize(path, 32, 24)
    assert out.shape == (24, 32, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_decode_jpeg(img_files):
    path, arr = img_files[1]  # jpeg: lossy, compare loosely
    out = decode_resize(path, 64, 48)
    ref = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    assert np.abs(out - ref).mean() < 0.02


def test_decode_batch_threaded(img_files):
    paths = [p for p, _ in img_files] * 4  # 12 decodes
    out = decode_batch(paths, 32, 32, num_threads=4)
    assert out.shape == (12, 32, 32, 3)
    assert np.isfinite(out).all()
    # batch result equals single decodes
    single = decode_resize(paths[0], 32, 32)
    np.testing.assert_allclose(out[0], single, atol=1e-6)


def test_decode_missing_file_falls_back_or_errors():
    with pytest.raises(Exception):
        decode_resize("/nonexistent/file.png", 8, 8)


def test_tile_merge_host_matches_jax_merge():
    """Native Gaussian merge must match pipelines.tiling.merge_tiles."""
    import jax.numpy as jnp

    from faithdiff_tpu.pipelines.tiling import merge_tiles, split_tiles

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 96, 4)).astype(np.float32)
    lay = compute_tile_layout(64, 96, (32, 32), overlap=0.5)
    tiles = np.asarray(split_tiles(jnp.asarray(x), lay))
    ref = np.asarray(merge_tiles(jnp.asarray(tiles), lay))[0]
    got = tile_merge_host(tiles, np.asarray(lay.offsets, np.int32), (64, 96))
    np.testing.assert_allclose(got, ref, atol=1e-4)
