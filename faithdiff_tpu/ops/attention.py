"""Attention kernels.

Replaces the reference's xformers / SDPA CUDA attention
(`/root/reference/FaithDiff/pipelines/pipeline_FaithDiff_tlc.py:21-27`,
`/root/reference/llava/train/llama_flash_attn_monkey_patch.py`) with a
TPU Pallas flash-attention kernel (block-wise online softmax, fp32
accumulation) plus an XLA einsum path used as the backward rule, on CPU,
and for tiny shapes where kernel launch overhead dominates.

Layout: ``q, k, v`` are ``[batch, num_heads, seq, head_dim]``.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634


def _xla_attention(q, k, v, scale: float, causal: bool = False):
    """Reference attention in pure XLA (fp32 softmax accumulation)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if causal:
        q_len, k_len = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((q_len, k_len), dtype=bool), k_len - q_len)
        logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, causal):
    """One (batch*head, q_block) program: online-softmax over k blocks.

    The softmax runs in base 2 with the scale folded into q once
    (exp(x) == exp2(x*log2e)) — measured 18% faster at the SDXL 4096-token
    shape than per-score scaling + exp, because it converts two full
    [block_q, block_k] VPU passes into one [block_q, d] pass. With
    block_k == kv_len (the default when the f32 score block fits VMEM) the
    loop degenerates to a single pass with no online-rescale work.
    """
    q = q_ref[0]                                       # [block_q, d] native dtype
    block_q = q.shape[0]
    kv_len = k_ref.shape[1]
    num_kb = kv_len // block_k
    q_block_idx = pl.program_id(1)
    # fold softmax scale + exp->exp2 conversion into q (one small VPU pass)
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        # keep matmul inputs in the native dtype (bf16 MXU rate) and
        # accumulate fp32 via preferred_element_type
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [block_q, block_k]
        if causal:
            q_idx = q_block_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_idx = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(q_idx >= k_idx, s, DEFAULT_MASK_VALUE)
        m_cur = jnp.max(s, axis=-1, keepdims=True)     # [block_q, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), DEFAULT_MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_kernel_bsnd(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                       scale, heads, n_kv_blocks):
    """One (batch, q_block, kv_block) program over PACKED [b, s, n*d]
    layouts — the natural qkv-projection output. The BHSD kernel forces
    four [b,s,n,d]<->[b,n,s,d] transposes around every attention op
    (the round-2 profile's copy bucket); here head columns are sliced
    in VMEM instead. Online softmax state per head lives in scratch and
    carries across the kv grid dim.

    q: [1, bq, n*d]; k/v: [1, bkv, n*d]; scratch acc [bq, n*d] f32,
    m/l [heads, bq, 1] f32 (head indexed on the leading dim — lane-width-1
    column stores into a [bq, heads] buffer are hostile to Mosaic).
    """
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[:] = jnp.zeros_like(l_ref)

    d = q_ref.shape[-1] // heads
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = (q[:, sl].astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, bkv]
        m_prev = m_ref[h]                                # [bq, 1]
        l_prev = l_ref[h]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[h] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + pv
        m_ref[h] = m_new

    @pl.when(kb == n_kv_blocks - 1)
    def _():
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            o_ref[0, :, sl] = (acc_ref[:, sl] / l_ref[h]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "block_q", "block_k",
                              "interpret"))
def _flash_attention_bsnd_impl(q, k, v, *, heads, scale, block_q=256,
                               block_k=1024, interpret=False):
    """Packed-layout flash attention: q [b, sq, n*d], k/v [b, skv, n*d],
    non-causal, forward only. Returns [b, sq, n*d]."""
    b, sq, f = q.shape
    skv = k.shape[1]
    d = f // heads
    bq = _pick_block(sq, block_q)
    bkv = _pick_block(skv, block_k)
    grid = (b, sq // bq, skv // bkv)
    return pl.pallas_call(
        functools.partial(_flash_kernel_bsnd, scale=scale, heads=heads,
                          n_kv_blocks=skv // bkv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, f), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bkv, f), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, f), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, f), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, f), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, f), jnp.float32),
            pltpu.VMEM((heads, bq, 1), jnp.float32),
            pltpu.VMEM((heads, bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * sq * skv * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * heads * sq * skv,
        ),
        interpret=interpret,
    )(q, k, v)


def _einsum_bsnd(q, k, v, heads: int, scale: float):
    """Packed-layout attention reference in plain XLA (fp32 softmax) —
    the short-sequence path and the backward rule for the BSND kernel."""
    b, sq, f = q.shape
    skv = k.shape[1]
    d = f // heads
    q4 = q.reshape(b, sq, heads, d)
    k4 = k.reshape(b, skv, heads, d)
    v4 = v.reshape(b, skv, heads, d)
    s = jnp.einsum("bqnd,bknd->bnqk", q4, k4,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", p.astype(v.dtype), v4,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, sq, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bsnd(q, k, v, heads, scale):
    return _flash_attention_bsnd_impl(q, k, v, heads=heads, scale=scale)


def _flash_bsnd_fwd(q, k, v, heads, scale):
    return _flash_bsnd(q, k, v, heads, scale), (q, k, v)


def _flash_bsnd_bwd(heads, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _einsum_bsnd(q, k, v, heads, scale),
                     q, k, v)
    return vjp(g)


_flash_bsnd.defvjp(_flash_bsnd_fwd, _flash_bsnd_bwd)


def attention_packed(q, k, v, heads: int, scale: Optional[float] = None,
                     use_flash: Optional[bool] = None,
                     interpret: bool = False):
    """Attention over packed [b, s, n*d] activations (the natural Dense
    output layout) — no BSHD transposes on either side. Dispatches to the
    BSND Pallas kernel for long self-attention shapes, else to a BSND
    einsum (cross-attention over 77 text tokens)."""
    sq, f = q.shape[1], q.shape[2]
    skv = k.shape[1]
    d = f // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_flash is None:
        use_flash = (_on_tpu() and sq >= _MIN_PALLAS_SEQ
                     and skv >= _MIN_PALLAS_SEQ
                     and d % 64 == 0 and sq % 128 == 0 and skv % 128 == 0)
    if use_flash:
        if interpret:
            return _flash_attention_bsnd_impl(
                q, k, v, heads=heads, scale=scale, interpret=True)
        return _flash_bsnd(q, k, v, heads, scale)
    return _einsum_bsnd(q, k, v, heads, scale)


def _chunked_xla_attention(q, k, v, scale: float, chunk: int = 1024):
    """Memory-efficient attention in plain XLA: lax.scan over KV chunks with
    a running online softmax. Used for long-KV shapes whose K/V do not fit
    in VMEM for the Pallas kernel (e.g. the VAE's 16k x 512 single-head
    spatial attention). Non-causal only."""
    b, h, sq, d = q.shape
    kv_len = k.shape[2]
    while kv_len % chunk:
        chunk //= 2
    n_chunks = kv_len // chunk
    q32 = q.astype(jnp.float32) * scale
    kc = k.reshape(b, h, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(b, h, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)

    def body(carry, kv):
        acc, m_prev, l_prev = carry
        kb, vb = kv
        s = jnp.einsum("bhqd,bhkd->bhqk", q32, kb.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p, vb.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        return (acc * alpha + pv, m_new, l_new), None

    acc0 = jnp.zeros((b, h, sq, d), jnp.float32)
    m0 = jnp.full((b, h, sq, 1), DEFAULT_MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((b, h, sq, 1), jnp.float32)
    (acc, _, l), _ = jax.lax.scan(body, (acc0, m0, l0), (kc, vc))
    return (acc / l).astype(q.dtype)


def _pick_block(seq: int, target: int) -> int:
    """Largest power-of-two block <= target that divides seq (min 128)."""
    b = min(target, seq)
    while seq % b != 0:
        b //= 2
    return max(b, 1)


@functools.partial(
    jax.jit, static_argnames=("scale", "causal", "block_q", "block_k", "interpret")
)
def _flash_attention_fwd_impl(
    q, k, v, *, scale, causal, block_q, block_k, interpret
):
    batch, heads, q_len, d = q.shape
    kv_len = k.shape[2]
    bq = _pick_block(q_len, block_q)
    # single-pass (block_k == kv_len) wins whenever the f32 score block fits
    # VMEM (measured: 62.5 vs 51.6 TF/s at [20, 4096, 64]); cap the score
    # block at 8 MB and fall back to the online loop past that
    if bq * kv_len * 4 <= 8 * 1024 * 1024:
        block_k = kv_len
    bk = _pick_block(kv_len, block_k)
    bh = batch * heads
    qr = q.reshape(bh, q_len, d)
    kr = k.reshape(bh, kv_len, d)
    vr = v.reshape(bh, kv_len, d)

    grid = (bh, q_len // bq)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=bk, causal=causal
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, kv_len, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, kv_len, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, q_len, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * q_len * kv_len * d,
            bytes_accessed=(qr.size + kr.size + vr.size) * q.dtype.itemsize,
            transcendentals=bh * q_len * kv_len,
        ),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(batch, heads, q_len, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention(q, k, v, scale, causal, block_q, block_k):
    return _flash_attention_fwd_impl(
        q, k, v, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, interpret=False,
    )


def _flash_fwd(q, k, v, scale, causal, block_q, block_k):
    out = _flash_attention(q, k, v, scale, causal, block_q, block_k)
    return out, (q, k, v)


def _flash_bwd(scale, causal, block_q, block_k, res, g):
    # Backward via XLA autodiff of the reference attention. Correct and
    # XLA-fusable; a dedicated Pallas backward kernel is a later optimisation.
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, scale, causal), q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


# Pallas pays off once the score matrix stops fitting comfortably in VMEM.
_MIN_PALLAS_SEQ = 1024
# the kernel keeps full K+V for one (batch, head) in VMEM: cap its footprint
# (elements, pre-padding — the lane dim pads d=64 to 128, and k+v are double
# buffered). 512k covers every SDXL UNet shape (max seq 4096 at d=64);
# larger (VAE 16k x 512) goes to the chunked-XLA online-softmax path.
_MAX_PALLAS_KV_ELEMS = 512 * 1024
# score-matrix size above which the plain XLA path becomes memory-hostile
_MAX_XLA_SCORE_ELEMS = 64 * 1024 * 1024
# XLA's fused dot_product_attention beats the Pallas kernel at SDXL shapes
# (68 vs 53 TF/s at [20,10,4096,64]) but materialises the score matrix —
# only use it while that stays within a ~1.5 GB bf16 budget
_MAX_NATIVE_SCORE_ELEMS = 768 * 1024 * 1024


def _native_attention(q, k, v, scale: float, causal: bool):
    """XLA fused attention (jax.nn.dot_product_attention, BSHD layout)."""
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = jax.nn.dot_product_attention(
        qt, kt, vt, scale=scale, is_causal=causal)
    return out.transpose(0, 2, 1, 3)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    use_flash: Optional[bool] = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jax.Array:
    """Scaled dot-product attention over ``[B, H, S, D]`` tensors.

    Dispatches to the Pallas flash kernel on TPU for long sequences and to
    the XLA path otherwise (CPU tests, short cross-attention over 77 text
    tokens where one fused einsum beats a kernel launch).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    kv_elems = k.shape[2] * k.shape[-1]
    score_elems = q.shape[0] * q.shape[1] * q.shape[2] * k.shape[2]
    long_seq = (q.shape[2] >= _MIN_PALLAS_SEQ
                and k.shape[2] >= _MIN_PALLAS_SEQ)
    # NOTE: jax.nn.dot_product_attention wins in isolation at SDXL shapes
    # (68 vs 53 TF/s) but REGRESSES the full UNet step (136 -> 173 ms):
    # the BHSD<->BSHD transposes + score-matrix HBM traffic outweigh the
    # fused-kernel win in context. Keep `_native_attention` available but
    # do not auto-select it.
    if use_flash is None:
        use_flash = (
            _on_tpu()
            and long_seq
            and q.shape[-1] % 64 == 0
            and k.shape[2] % 128 == 0
            and q.shape[2] % 128 == 0
            and kv_elems <= _MAX_PALLAS_KV_ELEMS
        )
    if use_flash:
        return _flash_attention(q, k, v, scale, causal, block_q, block_k)
    if not causal and score_elems > _MAX_XLA_SCORE_ELEMS:
        return _chunked_xla_attention(q, k, v, scale)
    return _xla_attention(q, k, v, scale, causal)


def attention_nld(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    **kwargs,
) -> jax.Array:
    """Attention over ``[batch, seq, dim]`` inputs, splitting heads internally."""
    b, sq, dim = q.shape
    sk = k.shape[1]
    hd = dim // num_heads
    kd = k.shape[-1] // num_heads

    def split(x, s, d):
        return x.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    out = multi_head_attention(
        split(q, sq, hd), split(k, sk, kd), split(v, sk, kd), **kwargs
    )
    return out.transpose(0, 2, 1, 3).reshape(b, sq, dim)
