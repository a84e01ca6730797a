"""Packed-layout (BSND) attention vs the BHSD reference paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faithdiff_tpu.ops.attention import (_einsum_bsnd, _xla_attention,
                                         attention_packed)


def _ref_packed(q, k, v, heads):
    """Reference: unpack -> BHSD xla attention -> repack."""
    b, sq, f = q.shape
    skv = k.shape[1]
    d = f // heads

    def hf(t, s):
        return t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    out = _xla_attention(hf(q, sq), hf(k, skv), hf(v, skv),
                         scale=1.0 / np.sqrt(d))
    return out.transpose(0, 2, 1, 3).reshape(b, sq, f)


@pytest.mark.parametrize("sq,skv,heads,d", [(8, 8, 2, 16), (16, 4, 4, 8)])
def test_einsum_bsnd_matches_bhsd(sq, skv, heads, d):
    rng = np.random.default_rng(0)
    f = heads * d
    q = jnp.asarray(rng.standard_normal((2, sq, f)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, skv, f)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, skv, f)), jnp.float32)
    got = _einsum_bsnd(q, k, v, heads, 1.0 / np.sqrt(d))
    want = _ref_packed(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_bsnd_kernel_matches_reference_interpret():
    """The Pallas BSND kernel (head slicing + per-head online softmax
    across kv blocks) vs the packed einsum reference."""
    rng = np.random.default_rng(1)
    heads, d, sq, skv = 3, 64, 256, 512
    f = heads * d
    q = jnp.asarray(rng.standard_normal((2, sq, f)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, skv, f)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, skv, f)), jnp.float32)
    got = attention_packed(q, k, v, heads, use_flash=True, interpret=True)
    want = _einsum_bsnd(q, k, v, heads, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_bsnd_kernel_multi_kv_block_interpret():
    """kv longer than one block: the online-softmax carry across the kv
    grid dim must be exact."""
    rng = np.random.default_rng(2)
    heads, d, sq, skv = 2, 64, 128, 2048   # 2 kv blocks at block_k=1024
    f = heads * d
    q = jnp.asarray(rng.standard_normal((1, sq, f)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, skv, f)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, skv, f)), jnp.float32)
    got = attention_packed(q, k, v, heads, use_flash=True, interpret=True)
    want = _einsum_bsnd(q, k, v, heads, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_attention_module_bsnd_matches_default(monkeypatch):
    """AttentionBlock output must be identical (within fp tolerance) with
    the packed path on and off."""
    from faithdiff_tpu.models import transformer2d as t2d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 32)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24)), jnp.float32)
    attn = t2d.Attention(query_dim=32, heads=4, dim_head=8,
                         cross_attention_dim=24)
    params = attn.init(jax.random.PRNGKey(0), x, ctx)
    base = attn.apply(params, x, ctx)
    monkeypatch.setattr(t2d, "_BSND_ATTN", True)
    packed = attn.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               atol=2e-6)
    # self-attention too
    base_s = attn.apply(params, x, None) if False else None
    sattn = t2d.Attention(query_dim=32, heads=4, dim_head=8)
    sparams = sattn.init(jax.random.PRNGKey(1), x)
    monkeypatch.setattr(t2d, "_BSND_ATTN", False)
    b0 = sattn.apply(sparams, x)
    monkeypatch.setattr(t2d, "_BSND_ATTN", True)
    b1 = sattn.apply(sparams, x)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=2e-6)


def test_bsnd_gradients_flow():
    rng = np.random.default_rng(4)
    heads, d, sq = 2, 64, 128
    f = heads * d
    q = jnp.asarray(rng.standard_normal((1, sq, f)), jnp.float32)

    def loss(q):
        return jnp.sum(attention_packed(q, q, q, heads, use_flash=False) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
