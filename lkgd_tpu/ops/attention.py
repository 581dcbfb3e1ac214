"""Attention dispatch: one signature, multiple backends.

The reference relies on xformers memory-efficient attention CUDA kernels
(`/root/reference/train_models/train_svd_lora.py:1121-1133`). On TPU the two regimes are:

  * **spatial** attention: seq = H*W/64 .. H*W/4096 tokens (≈ 9216 at 576x1024 top level) —
    the flash-attention regime; a Pallas kernel (lkgd_tpu.ops.flash_attention) is used when
    shapes qualify, otherwise XLA's fused attention.
  * **temporal** attention: seq = num_frames (14/25) with batch = B*H*W — tiny sequence,
    huge batch; XLA's batched matmul path is already optimal, flash brings nothing.

``dot_product_attention`` takes (B, S, H, D) and returns (B, S, H*D)-compatible
(B, S, H, D) output.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# Flash kernel thresholds: only worth it for long sequences on real TPU.
_FLASH_MIN_SEQ = 1024


def _use_flash(q: jnp.ndarray, k: jnp.ndarray, mask) -> bool:
    if os.environ.get("LKGD_DISABLE_FLASH"):
        return False
    if mask is not None:
        return False
    # LKGD_FORCE_FLASH: trace the Mosaic kernels even when the default backend is not a
    # TPU — the deviceless-AOT certification path (bench.py LKGD_BENCH_MESH=joint)
    # compiles against a TPU *topology* while the local backend is CPU, and the certified
    # graph must BE the deployment graph.
    if not os.environ.get("LKGD_FORCE_FLASH") and jax.default_backend() not in ("tpu", "axon"):
        return False
    if q.shape[1] < _FLASH_MIN_SEQ or k.shape[1] < _FLASH_MIN_SEQ:
        return False
    from lkgd_tpu.ops.flash_attention import supports

    return supports(q.shape, k.shape)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Softmax attention over (B, S, H, D) tensors; returns (B, Sq, H, D)."""
    if _use_flash(q, k, mask):
        try:
            from lkgd_tpu.ops.flash_attention import flash_attention

            return flash_attention(q, k, v)
        except Exception:  # pragma: no cover — fall back if kernel unavailable
            if os.environ.get("LKGD_FORCE_FLASH"):
                raise  # forced mode (AOT certification) must not silently degrade
    return _xla_attention(q, k, v, mask)


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    scale = q.shape[-1] ** -0.5
    # (B, H, Sq, Sk) logits in fp32 for a stable softmax
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=q.dtype)


_LOG2E = 1.4426950408889634


def attention_with_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Attention over (B, S, H, D) returning (out, lse2): ``lse2`` (B, S_q, H, fp32) is the
    log2-domain logsumexp of the scaled logits. Partial results over disjoint key blocks
    combine exactly as out = Σ out_i · 2^(lse_i − LSE), LSE = logsumexp2_i(lse_i) — the
    primitive ring attention is built on. Flash kernel on TPU, XLA fallback elsewhere."""
    if _use_flash(q, k, None):
        try:
            from lkgd_tpu.ops.flash_attention import flash_attention_with_lse

            return flash_attention_with_lse(q, k, v)
        except Exception:  # pragma: no cover — fall back if kernel unavailable
            if os.environ.get("LKGD_FORCE_FLASH"):
                raise  # forced mode (AOT certification) must not silently degrade
    scale = q.shape[-1] ** -0.5
    logits2 = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32) * (scale * _LOG2E)
    m = jnp.max(logits2, axis=-1, keepdims=True)
    p = jnp.exp2(logits2 - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", (p / l).astype(q.dtype), v,
                     preferred_element_type=q.dtype)
    lse2 = (m + jnp.log2(l))[..., 0].transpose(0, 2, 1)  # (B, S_q, H)
    return out, lse2
