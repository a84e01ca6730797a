"""Batched tiled_apply (the tile-parallel VAE/denoise-encoder tail) must
be exactly the per-tile path: same tiles, same blend, batched execution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faithdiff_tpu.models.vae import tiled_apply


def _fn(t):
    # resolution-preserving stand-in with spatial coupling (mean-shift) so
    # wrong tile routing or batch mixing changes values
    return t * 2.0 + jnp.mean(t, axis=(1, 2), keepdims=True)


def _batched(ts):
    return _fn(ts)          # _fn is batch-independent per construction


@pytest.mark.parametrize("hw,batch", [((96, 96), 2), ((96, 128), 3),
                                      ((160, 96), 8)])
def test_batched_matches_per_tile(hw, batch):
    """Ragged grids (edge tiles smaller) group by shape; padded group
    entries are dropped; row/col blend structure preserved."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, *hw, 3)), jnp.float32)
    want = tiled_apply(_fn, x, tile_in=64, overlap_factor=0.25, scale=1.0)
    got = tiled_apply(_fn, x, tile_in=64, overlap_factor=0.25, scale=1.0,
                      batched_fn=_batched, batch=batch)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_batched_with_scale_change():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 4)), jnp.float32)

    def down(t):
        return t[:, ::2, ::2, :] * 0.5

    want = tiled_apply(down, x, tile_in=64, overlap_factor=0.25, scale=0.5)
    got = tiled_apply(down, x, tile_in=64, overlap_factor=0.25, scale=0.5,
                      batched_fn=down, batch=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_batched_under_mesh_sharding():
    """The factory's tail path: batched calls with a mesh sharding
    constraint on the batch axis must still be value-identical."""
    from faithdiff_tpu.parallel.mesh import batch_sharding, make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(2)
    sh = batch_sharding(mesh)

    def batched(ts):
        ts = jax.lax.with_sharding_constraint(ts, sh)
        return jax.lax.with_sharding_constraint(_fn(ts), sh)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
    want = tiled_apply(_fn, x, tile_in=64, overlap_factor=0.25, scale=1.0)
    got = tiled_apply(_fn, x, tile_in=64, overlap_factor=0.25, scale=1.0,
                      batched_fn=jax.jit(batched), batch=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
