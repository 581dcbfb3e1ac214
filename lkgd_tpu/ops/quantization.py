"""Int8 quantized matmul/conv for deployment inference (w8a8, dynamic per-token).

The TPU analog of the TensorRT int8 deployment path GPU serving stacks use. NOTE the
measured reality on v5e (BASELINE.md session 4): although the chip's datasheet doubles
int8 MXU throughput, XLA lowers s8 x s8 -> s32 dots at ~the bf16 rate (measured at the
UNet's own shapes: 54-90 TOP/s vs 24-85 TF/s bf16 — a wash; +26% on 3x3 convs only).
The value of this module on TPU is therefore *memory*, not FLOPs: int8 weights halve
HBM for serving (bigger decode chunks, 2 models resident), and the dynamic-activation
path stands ready should a future XLA lowering unlock the double rate. The scheme is
the standard SmoothQuant-free dynamic variant:

  * weights: symmetric per-output-channel int8 (scale = max|w| / 127 per column),
    quantized from the bf16 params *inside* the jitted program — in a denoising
    ``lax.scan`` the params are loop-invariant, so XLA hoists the weight quantization
    out of the loop and it costs one pass total, while the param tree / checkpoints /
    porters stay untouched;
  * activations: symmetric per-token (per-row) int8, computed on the fly (two extra
    VPU passes over the activations — amortized against the 2x MXU win, which nets
    out positive only for large matmuls; callers gate on shape).

Reference analog: `CogVideo-main/inference/cli_demo_quantization.py` (torchao int8
weight-only serving). Accuracy is validated in tests/test_quantization.py (error bounds
vs fp32). NOT yet wired into a model forward: whether int8 weight storage actually
halves serving HBM under XLA depends on whether the dequant stays fused into each
consumer matmul or gets hoisted out of the denoising ``lax.scan`` as a materialized
bf16 buffer — that must be measured on the real chip (buffer assignment + profile)
before the wiring is worth its complexity; until then this stays a validated primitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8: (..., C) -> (int8 values, (..., 1) fp32 scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_cols(w: jnp.ndarray):
    """Symmetric per-output-channel int8 for a (C, F) weight: values + (F,) scale."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(..., C) x (C, F) -> (..., F) via dynamic w8a8: int8 MXU matmul with fp32
    rescale epilogue. Output dtype follows ``x.dtype``."""
    shape = x.shape
    xq, xs = quantize_rows(x.reshape(-1, shape[-1]))
    wq, ws = quantize_cols(w)
    y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * ws[None, :]
    return y.astype(x.dtype).reshape(*shape[:-1], w.shape[-1])


def int8_conv2d(x: jnp.ndarray, w: jnp.ndarray, strides=(1, 1),
                padding="SAME") -> jnp.ndarray:
    """NHWC x HWIO int8 conv with per-output-channel weight scales and per-image
    (not per-pixel) activation scale — conv reduces over patches, so a per-pixel
    scale cannot ride the MXU reduction; per-image keeps the epilogue rank-1."""
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-8)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    ws = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0
    ws = jnp.maximum(ws, 1e-8)
    wq = jnp.clip(jnp.round(wf / ws[None, None, None, :]), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * xs * ws[None, None, None, :]).astype(x.dtype)


def min_quant_rows(c: int, f: int, threshold_flops: float = 2.0e8) -> int:
    """Row count above which w8a8 pays off (quant passes cost ~2 VPU reads of x; the
    MXU win is ~half the bf16 matmul time). Below this, callers keep bf16."""
    return max(1024, int(threshold_flops / max(2 * c * f, 1)))
