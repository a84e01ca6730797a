"""Tile grid/merge math tests (reference semantics:
`pipeline_FaithDiff_tlc.py:101-283`)."""
import jax.numpy as jnp
import numpy as np
import pytest

from faithdiff_tpu.pipelines.tiling import (
    compute_tile_layout,
    gaussian_tile_weights,
    merge_tiles,
    pad_for_tiles,
    split_tiles,
    tile_position_ids,
)


def test_layout_single_tile():
    lay = compute_tile_layout(128, 128, (128, 128), overlap=0.5)
    assert lay.num_tiles == 1
    assert lay.offsets == ((0, 0),)


def test_layout_overlap_grid():
    # 256x256 with 128-tiles, overlap 0.5 -> stride 64; rows at 0,64,128 and
    # a clamped final row at 128 (reference while-loop semantics).
    lay = compute_tile_layout(256, 256, (128, 128), overlap=0.5)
    rows = sorted({i for i, _ in lay.offsets})
    cols = sorted({j for _, j in lay.offsets})
    assert rows == [0, 64, 128]
    assert cols == [0, 64, 128]
    assert lay.num_tiles == 9


def test_layout_kernel_larger_than_input():
    lay = compute_tile_layout(64, 96, (128, 128), overlap=0.5)
    assert lay.kernel == (64, 96)
    assert lay.num_tiles == 1


def test_layout_non_divisible():
    # 300 wide with k=128, stride 64: j = 0, 64, 128, clamp(192+)->172 last
    lay = compute_tile_layout(128, 300, (128, 128), overlap=0.5)
    cols = [j for _, j in lay.offsets]
    assert cols == [0, 64, 128, 172]
    assert all(j + 128 <= 300 for j in cols)


def test_gaussian_weights_properties():
    w = gaussian_tile_weights(128, 128)
    assert w.shape == (128, 128)
    assert np.all(w > 0)
    # reference midpoints: x symmetric around (w-1)/2, y around h/2
    np.testing.assert_allclose(w[:, 0], w[:, -1], rtol=1e-6)
    assert w[64, 64] == w.max()


def test_split_merge_roundtrip():
    # Weighted average of identical overlapping tiles must reconstruct the
    # input exactly (to fp tolerance) for any grid geometry.
    rng = np.random.default_rng(0)
    for h, w in [(128, 128), (256, 256), (192, 320), (130, 250)]:
        x = jnp.asarray(rng.standard_normal((1, h, w, 4)), jnp.float32)
        lay = compute_tile_layout(h, w, (128, 128), overlap=0.5)
        tiles = split_tiles(x, lay)
        assert tiles.shape == (lay.num_tiles, lay.kernel[0], lay.kernel[1], 4)
        merged = merge_tiles(tiles, lay)
        np.testing.assert_allclose(np.asarray(merged), np.asarray(x), atol=1e-5)


def test_merge_blends_disagreeing_tiles():
    # Two horizontally-overlapping tiles with different constants: the merged
    # overlap must be strictly between the two values.
    lay = compute_tile_layout(8, 12, (8, 8), overlap=0.5)
    assert lay.num_tiles == 2
    tiles = jnp.stack(
        [jnp.zeros((8, 8, 4)), jnp.ones((8, 8, 4))], axis=0
    ).astype(jnp.float32)
    merged = np.asarray(merge_tiles(tiles, lay))
    assert merged[0, 0, 0, 0] == 0.0  # only tile 0 covers col 0
    assert merged[0, 0, -1, 0] == 1.0  # only tile 1 covers last col
    overlap_val = merged[0, 4, 6, 0]
    assert 0.0 < overlap_val < 1.0


def test_tile_position_ids():
    lay = compute_tile_layout(256, 256, (128, 128), overlap=0.5)
    ids = tile_position_ids(lay)
    assert ids.shape == (lay.num_tiles, 2)
    assert tuple(ids[0]) == (0, 0)


def test_pad_for_tiles():
    x = jnp.ones((1, 100, 130, 4))
    padded, pad = pad_for_tiles(x, (64, 64))
    assert padded.shape[1] % 64 == 0 and padded.shape[2] % 64 == 0
    l, r, t, b = pad
    assert l + r == padded.shape[2] - 130
    assert t + b == padded.shape[1] - 100
