"""Fused NF4 dequant-matmul Pallas kernel vs the XLA reference path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faithdiff_tpu.ops.nf4_matmul import nf4_fusable, nf4_matmul_fused
from faithdiff_tpu.utils.quantize import (NF4_PACK_HALFROW, NF4Weight,
                                          dequantize_nf4, nf4_matmul,
                                          quantize_nf4, repack_nf4)


def test_halfrow_pack_layout():
    """Byte (o, c) holds element (o, c) in the high nibble and
    (o, c + in/2) in the low; absmax blocks are 64 consecutive row
    elements."""
    in_f, out_f = 128, 8
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((in_f, out_f)), jnp.float32)
    q = quantize_nf4(w)
    assert int(q.pack_format) == NF4_PACK_HALFROW
    assert q.packed.shape == (out_f, in_f // 2)
    assert q.absmax.shape == (out_f, in_f // 64)
    dense = np.asarray(dequantize_nf4(q, jnp.float32))  # [in, out]
    # row o, element c must come from byte (o, c)'s high nibble
    p = np.asarray(q.packed)
    am = np.asarray(q.absmax)
    from faithdiff_tpu.utils.quantize import NF4_CODE
    o, c = 3, 10
    assert dense[c, o] == np.float32(
        NF4_CODE[p[o, c] >> 4] * am[o, c // 64])
    c2 = 10 + in_f // 2
    assert dense[c2, o] == np.float32(
        NF4_CODE[p[o, 10] & 0xF] * am[o, c2 // 64])


def test_repack_pairwise_and_halfblock_to_halfrow():
    """Trees persisted in the two legacy layouts must repack losslessly."""
    in_f, out_f = 256, 16
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((in_f, out_f)), jnp.float32)
    q = quantize_nf4(w)
    dense = np.asarray(dequantize_nf4(q, jnp.float32))

    idx = np.zeros((out_f, in_f), np.uint8)
    p = np.asarray(q.packed)
    idx[:, :in_f // 2] = p >> 4
    idx[:, in_f // 2:] = p & 0xF
    flat = idx.reshape(-1, 64)
    flat_absmax = jnp.asarray(np.asarray(q.absmax).reshape(-1))
    # pairwise (bitsandbytes): element 2i high, 2i+1 low
    pair = (flat[:, 0::2] << 4) | flat[:, 1::2]
    q_pair = NF4Weight(packed=jnp.asarray(pair), absmax=flat_absmax,
                       shape=q.shape, pack_format=1)
    # half-block (round 3): first half of each 64-block high
    hb = (flat[:, :32] << 4) | flat[:, 32:]
    q_hb = NF4Weight(packed=jnp.asarray(hb), absmax=flat_absmax,
                     shape=q.shape, pack_format=2)
    for legacy in (q_pair, q_hb):
        r = repack_nf4(legacy)
        assert int(r.pack_format) == NF4_PACK_HALFROW
        np.testing.assert_array_equal(
            np.asarray(dequantize_nf4(r, jnp.float32)), dense)


@pytest.mark.parametrize("b,in_f,out_f", [(1, 512, 256), (4, 1024, 512),
                                          (3, 512, 288)])
def test_fused_matches_xla_path(b, in_f, out_f):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((in_f, out_f)) * 0.05, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, in_f)), jnp.float32)
    q = quantize_nf4(w)
    assert nf4_fusable(q, b)

    want = nf4_matmul(x, q, compute_dtype=jnp.float32)
    got = nf4_matmul_fused(x, q, compute_dtype=jnp.float32, interpret=True)
    # identical decode values, fp32 MXU accumulation both sides: tight tol
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_direct_dequant():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((512, 256)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    q = quantize_nf4(w)
    dense = dequantize_nf4(q, jnp.float32)
    want = x @ dense
    got = nf4_matmul_fused(x, q, compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_leading_dims():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((512, 256)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 3, 512)), jnp.float32)
    q = quantize_nf4(w)
    got = nf4_matmul_fused(x, q, compute_dtype=jnp.float32, interpret=True)
    want = nf4_matmul(x, q, compute_dtype=jnp.float32)
    assert got.shape == (2, 3, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fusable_refuses_pairwise_and_odd_shapes():
    rng = np.random.default_rng(3)
    q = quantize_nf4(jnp.asarray(rng.standard_normal((512, 256)), jnp.float32))
    assert nf4_fusable(q, 1)
    assert not nf4_fusable(q._replace(pack_format=1), 1)
    q_odd = quantize_nf4(
        jnp.asarray(rng.standard_normal((192, 256)), jnp.float32))
    assert not nf4_fusable(q_odd, 1)     # in=192 has no 256-multiple tile


def test_llava_13b_shapes_fusable():
    """Every quantised matrix in the 13B captioner must take the fused
    path (d=5120, ffn=13824; lm_head stays bf16 under nf4)."""
    for in_f, out_f in [(5120, 5120), (5120, 13824), (13824, 5120),
                        (5120, 15360)]:
        q = NF4Weight(packed=jnp.zeros((out_f, in_f // 2), jnp.uint8),
                      absmax=jnp.ones((out_f, in_f // 64), jnp.float32),
                      shape=(in_f, out_f))
        assert nf4_fusable(q, 1), (in_f, out_f)
        assert nf4_fusable(q, 650), (in_f, out_f)
