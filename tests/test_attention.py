"""Attention kernel tests: XLA path vs torch SDPA, Pallas (interpret) vs XLA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faithdiff_tpu.ops.attention import (
    _flash_attention_fwd_impl,
    _xla_attention,
    attention_nld,
    multi_head_attention,
)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_xla_attention_matches_torch_sdpa():
    import torch

    q = _rand((2, 4, 64, 32), 0)
    k = _rand((2, 4, 64, 32), 1)
    v = _rand((2, 4, 64, 32), 2)
    out = multi_head_attention(q, k, v, use_flash=False)
    tq, tk, tv = (torch.from_numpy(np.asarray(a)) for a in (q, k, v))
    ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_xla_attention_causal_matches_torch():
    import torch

    q = _rand((1, 2, 32, 16), 3)
    k = _rand((1, 2, 32, 16), 4)
    v = _rand((1, 2, 32, 16), 5)
    out = multi_head_attention(q, k, v, use_flash=False, causal=True)
    tq, tk, tv = (torch.from_numpy(np.asarray(a)) for a in (q, k, v))
    ref = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, is_causal=True
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_flash_kernel_interpret_matches_xla():
    q = _rand((1, 2, 256, 64), 6)
    k = _rand((1, 2, 256, 64), 7)
    v = _rand((1, 2, 256, 64), 8)
    scale = 1.0 / np.sqrt(64)
    ref = _xla_attention(q, k, v, scale)
    out = _flash_attention_fwd_impl(
        q, k, v, scale=scale, causal=False, block_q=128, block_k=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_kernel_causal_interpret():
    q = _rand((1, 1, 256, 64), 9)
    k = _rand((1, 1, 256, 64), 10)
    v = _rand((1, 1, 256, 64), 11)
    scale = 0.125
    ref = _xla_attention(q, k, v, scale, causal=True)
    out = _flash_attention_fwd_impl(
        q, k, v, scale=scale, causal=True, block_q=128, block_k=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_nld_matches_torch_mha():
    """Cross-check the [B, S, D] wrapper against torch MultiheadAttention
    (the reference info-transformer uses nn.MultiheadAttention,
    `unet_2d_condition_vae_extension.py:238-260`): equal when projections
    are identity."""
    x = _rand((2, 16, 32), 12)
    out = attention_nld(x, x, x, num_heads=4, use_flash=False)

    import torch

    tx = torch.from_numpy(np.asarray(x))
    ref = torch.nn.functional.scaled_dot_product_attention(
        tx.view(2, 16, 4, 8).transpose(1, 2),
        tx.view(2, 16, 4, 8).transpose(1, 2),
        tx.view(2, 16, 4, 8).transpose(1, 2),
    ).transpose(1, 2).reshape(2, 16, 32)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_attention_grad_flows():
    q = _rand((1, 2, 64, 32), 13)

    def loss(q):
        return jnp.sum(multi_head_attention(q, q, q, use_flash=False) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()


def test_chunked_xla_attention_matches_reference():
    from faithdiff_tpu.ops.attention import _chunked_xla_attention

    q = _rand((1, 2, 64, 32), 20)
    k = _rand((1, 2, 2048, 32), 21)
    v = _rand((1, 2, 2048, 32), 22)
    scale = 1.0 / np.sqrt(32)
    ref = _xla_attention(q, k, v, scale)
    out = _chunked_xla_attention(q, k, v, scale, chunk=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_native_attention_matches_reference():
    from faithdiff_tpu.ops.attention import _native_attention

    q = _rand((1, 2, 128, 32), 30)
    k = _rand((1, 2, 128, 32), 31)
    v = _rand((1, 2, 128, 32), 32)
    scale = 1.0 / np.sqrt(32)
    ref = _xla_attention(q, k, v, scale)
    out = _native_attention(q, k, v, scale, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
