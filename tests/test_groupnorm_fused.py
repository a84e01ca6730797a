"""Fused Pallas GroupNorm vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faithdiff_tpu.ops.groupnorm import (_fused_group_norm_fwd,
                                         fused_group_norm, group_norm,
                                         group_norm_reference)


@pytest.mark.parametrize("shape,g", [((2, 8, 8, 64), 8), ((1, 6, 10, 96), 32),
                                     ((2, 16, 4, 128), 32)])
def test_fused_matches_reference(shape, g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.3, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    want = group_norm_reference(x, scale, bias, g, 1e-5)
    got = _fused_group_norm_fwd(x, scale, bias, None, g, 1e-5, None,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_silu_epilogue():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    scale = jnp.ones(64)
    bias = jnp.zeros(64)
    want = group_norm_reference(x, scale, bias, 8, 1e-5, act="silu")
    got = _fused_group_norm_fwd(x, scale, bias, None, 8, 1e-5, "silu",
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # and the plain reference + silu agree
    base = group_norm_reference(x, scale, bias, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(want),
                               np.asarray(jax.nn.silu(base)), atol=1e-6)


def test_fused_add_prologue():
    """The per-(batch, channel) `add` prologue (ResNet time-embedding
    injection, round-4 fusion-spanning kernel) must equal add-then-norm."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    add = jnp.asarray(rng.standard_normal((2, 64)) * 0.5, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(64), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64), jnp.float32)
    want = group_norm_reference(x + add[:, None, None, :], scale, bias, 8,
                                1e-5, act="silu")
    via_ref = group_norm_reference(x, scale, bias, 8, 1e-5, act="silu",
                                   add=add)
    np.testing.assert_allclose(np.asarray(via_ref), np.asarray(want),
                               atol=1e-6)
    got = _fused_group_norm_fwd(x, scale, bias, add, 8, 1e-5, "silu",
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_add_gradients():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 64)), jnp.float32)
    add = jnp.asarray(rng.standard_normal((1, 64)), jnp.float32)
    scale, bias = jnp.ones(64), jnp.zeros(64)

    def loss_ref(x, a):
        return jnp.sum(group_norm_reference(
            x + a[:, None, None, :], scale, bias, 8, 1e-5, "silu") ** 2)

    from faithdiff_tpu.ops import groupnorm as m

    def loss_add(x, a):
        return jnp.sum(m.group_norm(x, scale, bias, 8, 1e-5, "silu",
                                    add=a, use_pallas=False) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, add)
    g_add = jax.grad(loss_add, argnums=(0, 1))(x, add)
    for a, b_ in zip(g_ref, g_add):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_group_norm_module_unchanged_semantics():
    """The GroupNorm flax module must produce the same values as before the
    ops/groupnorm refactor (XLA path on CPU)."""
    from faithdiff_tpu.models.layers import GroupNorm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    gn = GroupNorm(8, 1e-5)
    params = gn.init(jax.random.PRNGKey(0), x)
    out = gn.apply(params, x)
    # reference: torch-style GN
    xg = np.asarray(x).reshape(2, 8 * 8, 8, 8)  # [b, s, g, c/g]
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    want = ((xg - mean) / np.sqrt(var + 1e-5)).reshape(2, 8, 8, 64)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_gradient_flows_through_custom_vjp():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 64)), jnp.float32)
    scale = jnp.ones(64)
    bias = jnp.zeros(64)

    def loss_ref(x, s, b):
        return jnp.sum(group_norm_reference(x, s, b, 8, 1e-5, "silu") ** 2)

    # the custom_vjp backward is defined as XLA autodiff of the reference,
    # so its gradients must match the reference gradients exactly
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    from faithdiff_tpu.ops import groupnorm as m

    def loss_fused(x, s, b):
        # route forward through the reference (CPU has no Mosaic) but the
        # vjp machinery of fused_group_norm
        return jnp.sum(m.group_norm(x, s, b, 8, 1e-5, "silu",
                                    use_pallas=False) ** 2)

    g_xla = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_ref, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_resnet_block_matches_previous_unfused_math():
    """ResnetBlock2D with fused GN+SiLU (+the norm2 `add` prologue carrying
    the time embedding) == manual add -> GN -> silu -> convs: the round-4
    injection-via-prologue refactor must not change the math."""
    from flax.core import unfreeze

    from faithdiff_tpu.models.resnet import ResnetBlock2D
    from faithdiff_tpu.ops.groupnorm import group_norm_reference

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)
    block = ResnetBlock2D(out_channels=64, groups=8)
    params = block.init(jax.random.PRNGKey(0), x, temb)
    out = block.apply(params, x, temb)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

    # manual recomputation with the PRE-round-4 ordering (h + temb then GN)
    p = unfreeze(params)["params"]

    def conv(name, h):
        k, b = p[name]["kernel"], p[name]["bias"]
        return jax.lax.conv_general_dilated(
            h, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    h = group_norm_reference(x, p["norm1"]["scale"], p["norm1"]["bias"], 8,
                             1e-5, act="silu")
    h = conv("conv1", h)
    tp = jax.nn.silu(temb) @ p["time_emb_proj"]["kernel"] \
        + p["time_emb_proj"]["bias"]
    h = h + tp[:, None, None, :]
    h = group_norm_reference(h, p["norm2"]["scale"], p["norm2"]["bias"], 8,
                             1e-5, act="silu")
    h = conv("conv2", h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x + h),
                               atol=1e-5)
