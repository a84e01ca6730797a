"""TLC (test-time local converter) tile grid/merge math.

JAX reimplementation of the reference `LocalAttention` tiling engine
(`/root/reference/FaithDiff/pipelines/pipeline_FaithDiff_tlc.py:101-283`):
overlapping k1xk2 tiles over a [1, H, W, C] latent, Gaussian-weighted
blend-merge (var=0.01), identical tile-offset enumeration so per-tile SDXL
micro-conditioning (`add_time_ids = [orig, (i, j), target]`) matches.

TPU-first design: the tile layout is *static* Python metadata (shapes are
known at trace time), `split` stacks tiles into a batch axis in one traced
expression, and `merge` is a weighted scatter-add expressed with
`.at[].add` — which XLA lowers to fused dynamic-update-slices, and which
under `shard_map` over a `tiles` mesh axis becomes a single `psum`.
Layout: NHWC (reference is NCHW).
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TileLayout:
    """Static description of an overlapping tile grid."""

    height: int
    width: int
    kernel: Tuple[int, int]            # (k1, k2) after clamping to H/W
    offsets: Tuple[Tuple[int, int], ...]  # (i, j) top-left corner per tile
    overlap: float

    @property
    def num_tiles(self) -> int:
        return len(self.offsets)


def compute_tile_layout(
    height: int, width: int, kernel: Tuple[int, int], overlap: float = 0.5
) -> TileLayout:
    """Enumerate tile offsets exactly as the reference `grids` does
    (`pipeline_FaithDiff_tlc.py:160-205`): stride = ceil(k * overlap),
    clamped last row/column so tiles never run off the edge."""
    k1, k2 = kernel
    k1 = min(k1, height)
    k2 = min(k2, width)
    num_row = (height - 1) // k1 + 1
    num_col = (width - 1) // k2 + 1
    step_i = k1 if num_row == 1 else math.ceil(k1 * overlap)
    step_j = k2 if num_col == 1 else math.ceil(k2 * overlap)

    offsets: List[Tuple[int, int]] = []
    i = 0
    last_i = False
    while i < height and not last_i:
        j = 0
        if i + k1 >= height:
            i = height - k1
            last_i = True
        last_j = False
        while j < width and not last_j:
            if j + k2 >= width:
                j = width - k2
                last_j = True
            offsets.append((i, j))
            j += step_j
        i += step_i
    return TileLayout(
        height=height, width=width, kernel=(k1, k2),
        offsets=tuple(offsets), overlap=overlap,
    )


def gaussian_tile_weights(
    tile_height: int, tile_width: int, var: float = 0.01
) -> np.ndarray:
    """Gaussian contribution mask, replicating `_gaussian_weights`
    (`pipeline_FaithDiff_tlc.py:207-228`) including its asymmetric midpoints:
    x uses (w-1)/2, y uses h/2.

    Returns [tile_height, tile_width] float32 (broadcasts over channels; the
    reference tiles it to 4 channels which is equivalent).
    """
    midpoint_x = (tile_width - 1) / 2
    x = np.arange(tile_width, dtype=np.float64)
    x_probs = np.exp(
        -(x - midpoint_x) ** 2 / (tile_width * tile_width) / (2 * var)
    ) / math.sqrt(2 * math.pi * var)
    midpoint_y = tile_height / 2
    y = np.arange(tile_height, dtype=np.float64)
    y_probs = np.exp(
        -(y - midpoint_y) ** 2 / (tile_height * tile_height) / (2 * var)
    ) / math.sqrt(2 * math.pi * var)
    return np.outer(y_probs, x_probs).astype(np.float32)


def split_tiles(x: jax.Array, layout: TileLayout) -> jax.Array:
    """[1, H, W, C] -> [T, k1, k2, C] by stacking static slices."""
    assert x.shape[0] == 1, "TLC tiling operates on batch size 1"
    k1, k2 = layout.kernel
    parts = [x[0, i:i + k1, j:j + k2, :] for (i, j) in layout.offsets]
    return jnp.stack(parts, axis=0)


def merge_tiles(
    tiles: jax.Array,
    layout: TileLayout,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Gaussian-weighted blend-merge: [T, k1, k2, C] -> [1, H, W, C].

    Equivalent to `grids_inverse` (`pipeline_FaithDiff_tlc.py:230-252`):
    accumulate tile * w into the canvas and divide by the accumulated w.
    """
    k1, k2 = layout.kernel
    t, th, tw, c = tiles.shape
    assert (th, tw) == (k1, k2), (tiles.shape, layout.kernel)
    if weights is None:
        weights = jnp.asarray(gaussian_tile_weights(k1, k2))
    w = weights.astype(jnp.float32)[None, :, :, None]
    tiles32 = tiles.astype(jnp.float32)

    if t >= 64:
        # one vectorized scatter-add instead of t unrolled updates: the
        # unrolled chain compiles one scatter per tile, which at 8K-class
        # tile counts (225 default, 841 at overlap 0.25) dominates compile
        # time. Indices are computed in-graph from the [T, 2] offsets so
        # no multi-hundred-MB index constant is embedded in the program.
        offs = jnp.asarray(np.asarray(layout.offsets, np.int32))
        yi = (offs[:, 0][:, None, None]
              + jnp.arange(k1, dtype=jnp.int32)[None, :, None])  # [T,k1,1]
        xi = (offs[:, 1][:, None, None]
              + jnp.arange(k2, dtype=jnp.int32)[None, None, :])  # [T,1,k2]
        yi = jnp.broadcast_to(yi, (t, k1, k2))
        xi = jnp.broadcast_to(xi, (t, k1, k2))
        acc = jnp.zeros((layout.height, layout.width, c), jnp.float32)
        acc = acc.at[yi, xi].add(tiles32 * w)
        cnt = jnp.zeros((layout.height, layout.width, 1), jnp.float32)
        cnt = cnt.at[yi, xi].add(
            jnp.broadcast_to(w[:, :, :, :1], (t, k1, k2, 1)))
        return (acc / cnt)[None].astype(tiles.dtype)

    acc = jnp.zeros((layout.height, layout.width, c), jnp.float32)
    cnt = jnp.zeros((layout.height, layout.width, 1), jnp.float32)
    for idx, (i, j) in enumerate(layout.offsets):
        acc = acc.at[i:i + k1, j:j + k2, :].add(tiles32[idx] * w[0])
        cnt = cnt.at[i:i + k1, j:j + k2, :].add(w[0, :, :, :1])
    return (acc / cnt)[None].astype(tiles.dtype)


def tile_position_ids(layout: TileLayout) -> np.ndarray:
    """[T, 2] (i, j) tile offsets for SDXL micro-conditioning — the tile
    offset replaces the crop coordinate in `add_time_ids`
    (`pipeline_FaithDiff_tlc.py:1337-1345`)."""
    return np.asarray(layout.offsets, dtype=np.int32)


def pad_for_tiles(x: jax.Array, kernel: Tuple[int, int]) -> Tuple[jax.Array, Tuple[int, int, int, int]]:
    """Reflect-pad [B, H, W, C] so H, W are multiples of the kernel
    (`LocalAttention._pad`, `pipeline_FaithDiff_tlc.py:254-269`).

    Returns (padded, (left, right, top, bottom))."""
    k1, k2 = kernel
    h, w = x.shape[1], x.shape[2]
    mod_pad_h = (k1 - h % k1) % k1
    mod_pad_w = (k2 - w % k2) % k2
    pad = (mod_pad_w // 2, mod_pad_w - mod_pad_w // 2,
           mod_pad_h // 2, mod_pad_h - mod_pad_h // 2)
    x = jnp.pad(
        x,
        ((0, 0), (pad[2], pad[3]), (pad[0], pad[1]), (0, 0)),
        mode="reflect",
    )
    return x, pad
