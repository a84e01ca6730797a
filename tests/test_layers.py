"""Layer kit tests: GroupNorm/LayerNorm vs torch; timestep embedding vs
diffusers semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from faithdiff_tpu.models.layers import (
    GroupNorm,
    LayerNorm,
    get_timestep_embedding,
    quick_gelu,
)


def test_groupnorm_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    gn = GroupNorm(num_groups=8, epsilon=1e-5)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomise scale/bias
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    out = gn.apply(params, jnp.asarray(x))

    tgn = torch.nn.GroupNorm(8, 32, eps=1e-5)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(scale))
        tgn.bias.copy_(torch.from_numpy(bias))
    ref = tgn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), atol=1e-5)


def test_groupnorm_bf16_preserves_dtype():
    x = jnp.ones((1, 4, 4, 16), jnp.bfloat16)
    gn = GroupNorm(num_groups=4)
    params = gn.init(jax.random.PRNGKey(0), x)
    out = gn.apply(params, x)
    assert out.dtype == jnp.bfloat16


def test_layernorm_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 7, 64)).astype(np.float32)
    ln = LayerNorm(epsilon=1e-5)
    scale = rng.standard_normal(64).astype(np.float32)
    bias = rng.standard_normal(64).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    out = ln.apply(params, jnp.asarray(x))

    tln = torch.nn.LayerNorm(64, eps=1e-5)
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(scale))
        tln.bias.copy_(torch.from_numpy(bias))
    ref = tln(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), atol=1e-5)


def test_timestep_embedding_semantics():
    """Mirror diffusers get_timestep_embedding: exp spacing, sin|cos order,
    flip_sin_to_cos swaps halves."""
    t = jnp.asarray([0.0, 1.0, 500.0, 999.0])
    dim = 320
    emb = get_timestep_embedding(t, dim, flip_sin_to_cos=True)
    assert emb.shape == (4, dim)
    half = dim // 2
    # manual reference
    exponent = -np.log(10000) * np.arange(half, dtype=np.float64) / half
    freqs = np.exp(exponent)
    args = np.asarray(t)[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), ref, atol=1e-4)
    # t=0: cos half all ones, sin half all zeros
    np.testing.assert_allclose(np.asarray(emb[0, :half]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, half:]), 0.0, atol=1e-6)


def test_quick_gelu_matches_reference():
    x = jnp.linspace(-5, 5, 101)
    ref = np.asarray(x) * (1.0 / (1.0 + np.exp(-1.702 * np.asarray(x))))
    np.testing.assert_allclose(np.asarray(quick_gelu(x)), ref, atol=1e-6)
