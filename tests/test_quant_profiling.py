"""Quantization + profiling subsystem tests."""
import jax
import jax.numpy as jnp
import numpy as np

from faithdiff_tpu.utils.profiling import phase, phase_report
from faithdiff_tpu.utils.quantize import (Int8Weight, dequantize_params,
                                          int8_matmul, param_bytes,
                                          quantize_int8, quantize_params_fp8)


def test_fp8_quantize_skips_norms_and_encoder():
    params = {
        "unet": {
            "conv_in": {"kernel": jnp.ones((3, 3, 4, 8), jnp.float32),
                        "bias": jnp.zeros((8,))},
            "norm1": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
        },
        "denoise_encoder": {"conv": {"kernel": jnp.ones((3, 3, 3, 8))}},
    }
    q = quantize_params_fp8(params)
    assert q["unet"]["conv_in"]["kernel"].dtype == jnp.float8_e4m3fn
    assert q["unet"]["norm1"]["scale"].dtype == jnp.float32
    assert q["unet"]["conv_in"]["bias"].dtype == jnp.float32  # 'bias' skipped
    assert q["denoise_encoder"]["conv"]["kernel"].dtype == jnp.float32
    assert param_bytes(q) < param_bytes(params)

    dq = dequantize_params(q)
    assert dq["unet"]["conv_in"]["kernel"].dtype == jnp.bfloat16


def test_fp8_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 64)) * 0.05, jnp.float32)
    q = w.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    rel = float(jnp.abs(q - w).mean() / jnp.abs(w).mean())
    assert rel < 0.05  # e4m3 keeps ~2 decimal digits


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((32, 16)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    qw = quantize_int8(w)
    assert qw.values.dtype == jnp.int8
    ref = x @ w
    out = int8_matmul(x, qw, compute_dtype=jnp.float32)
    rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
    assert rel < 0.02


def test_phase_timing():
    with phase("unit_test_phase"):
        x = sum(range(1000))
    rep = phase_report(reset=True)
    assert rep["unit_test_phase"]["count"] == 1
    assert rep["unit_test_phase"]["total_s"] >= 0


def test_checkpoint_delta_roundtrip():
    from faithdiff_tpu.utils.quantize import apply_delta, make_delta

    base = {"w": jnp.ones((4, 4)), "b": jnp.zeros((3,))}
    target = {"w": jnp.full((4, 4), 2.5), "b": jnp.ones((3,))}
    delta = make_delta(base, target)
    rec = apply_delta(base, delta)
    np.testing.assert_allclose(np.asarray(rec["w"]), 2.5)
    np.testing.assert_allclose(np.asarray(rec["b"]), 1.0)
