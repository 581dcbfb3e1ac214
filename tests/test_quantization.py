"""w8a8 dynamic quantization: error bounds vs fp32 and epilogue correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from lkgd_tpu.ops.quantization import (
    int8_conv2d, int8_matmul, quantize_cols, quantize_rows)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    q, s = quantize_rows(x)
    deq = q.astype(jnp.float32) * s
    # symmetric 8-bit: max error is half a step = max|row| / 254
    step = np.asarray(jnp.max(jnp.abs(x), axis=-1, keepdims=True)) / 127.0
    assert np.abs(np.asarray(deq - x)).max() <= (step / 2 + 1e-6).max()

    wq, ws = quantize_cols(x)
    deq = wq.astype(jnp.float32) * ws[None, :]
    step = np.asarray(jnp.max(jnp.abs(x), axis=0)) / 127.0
    assert np.abs(np.asarray(deq - x)).max() <= (step / 2 + 1e-6).max()


def test_int8_matmul_close_to_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(128, 320)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(320, 1280)) * 0.05, jnp.float32)
    ref = x @ w
    out = jax.jit(int8_matmul)(x, w)
    rel = float(jnp.linalg.norm(out.astype(jnp.float32) - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel  # w8a8 keeps ~1% relative error on gaussian data


def test_int8_matmul_bf16_io():
    x = jnp.ones((8, 16), jnp.bfloat16) * 0.5
    w = jnp.eye(16, dtype=jnp.bfloat16)
    out = int8_matmul(x, w)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), 0.5, atol=0.01)


def test_int8_conv_close_to_fp32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 32, 64)) * 0.05, jnp.float32)
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jax.jit(int8_conv2d)(x, w)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel
