"""GroupNorm(+SiLU) tuned for the TPU memory system.

GroupNorm is the most HBM-expensive non-matmul op in both the SVD UNet (4 GN per
spatio-temporal resblock + 1 per transformer, reference
`models/unet_spatio_temporal_condition.py` via diffusers resblocks) and the temporal VAE
decoder. Two problems with letting XLA lower it (both measured on v5e, BASELINE.md):
the stats reductions get emitted at 25-30 GB/s, and — worse — layout assignment
re-layouts the norm's *input* to feed the reduce, which propagates a transposed layout
into the producing convolution and cripples its emitter.

On TPU the Pallas path therefore runs stats + normalize as two kernels (2 reads + 1
write at HBM bandwidth, SiLU fused, fixed standard layouts on both sides — a layout
firewall). Everywhere else the pure-XLA formulation runs: row-axis-only fp32 reductions
(no minor-axis cross-lane reduce), one-pass variance, single fused ``act(x*a+b)``
epilogue. Both use the one-pass ``E[x^2] - E[x]^2`` variance with fp32 accumulators;
with bf16 activations the input quantization dominates any cancellation error (validated
against the two-pass reference in tests/test_group_norm.py).

Differentiable everywhere: the Pallas forward carries a custom VJP that recomputes the
backward through the XLA formulation.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# fp32 per-chunk temporaries capped at 2 MB (VMEM is ~16 MB/core; blocks double-buffer).
_CHUNK_BYTES_F32 = 2 * 1024 * 1024


def _pick_chunk(m: int, c: int) -> int:
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if m % cand == 0 and cand * c * 4 <= _CHUNK_BYTES_F32:
            return cand
    return 0


def _stats_kernel(x_ref, s_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)

    xf = x_ref[0].astype(jnp.float32)  # (CHUNK, C)
    s_ref[0, 0:1, :] += jnp.sum(xf, axis=0, keepdims=True)
    s_ref[0, 1:2, :] += jnp.sum(xf * xf, axis=0, keepdims=True)


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, act: Optional[str]):
    y = x_ref[0].astype(jnp.float32) * a_ref[0, 0] + b_ref[0, 0]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, *,
                       num_groups: int, eps: float, act: Optional[str],
                       interpret: bool = False) -> jnp.ndarray:
    """Two Pallas passes over (N, M, C): per-channel sum/sumsq accumulation (the (1,2,C)
    fp32 block stays VMEM-resident per sample), tiny XLA group-fold into per-(sample,
    channel) affine a/b, then a fused ``act(x*a+b)`` epilogue — 2 reads + 1 write at HBM
    bandwidth, and a layout firewall for the producing conv (see module docstring)."""
    n, m, c = x.shape
    chunk = _pick_chunk(m, c)
    k = m // chunk
    sums = pl.pallas_call(
        _stats_kernel,
        grid=(n, k),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        interpret=interpret,
    )(x)
    a, b = _sums_to_affine(sums[:, 0], sums[:, 1], scale, bias, m=m,
                           num_groups=num_groups, eps=eps)
    return pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(n, k),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, m, c), x.dtype),
        interpret=interpret,
    )(x, a[:, None, :], b[:, None, :])


@functools.lru_cache(maxsize=None)
def _make_op(num_groups: int, eps: float, act: Optional[str], interpret: bool):
    xla_fn = functools.partial(group_norm_xla, num_groups=num_groups, eps=eps, act=act)

    @jax.custom_vjp
    def op(x, scale, bias):
        return _pallas_group_norm(x, scale, bias, num_groups=num_groups, eps=eps,
                                  act=act, interpret=interpret)

    def fwd(x, scale, bias):
        return op(x, scale, bias), (x, scale, bias)

    def bwd(res, g):
        _, vjp = jax.vjp(xla_fn, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, *,
               num_groups: int, eps: float, act: Optional[str] = None,
               interpret: bool = False) -> jnp.ndarray:
    """GroupNorm over (N, M, C) with optional fused activation, in x.dtype.
    Pallas kernels on TPU; the XLA formulation elsewhere."""
    n, m, c = x.shape
    # The Pallas path is opt-in: in-network it breaks XLA's conv+stats mega-fusions and
    # measured net-slower at UNet shapes (BASELINE.md); the MXU-matvec XLA formulation
    # below is the default.
    use_pallas = (
        (interpret or os.environ.get("LKGD_FUSED_GN"))
        and c % num_groups == 0
        and _pick_chunk(m, c) > 0
    )
    if use_pallas:
        return _make_op(num_groups, float(eps), act, interpret)(x, scale, bias)
    return group_norm_xla(x, scale, bias, num_groups=num_groups, eps=eps, act=act)


def _affine_from_stats(mean_g: jnp.ndarray, inv_g: jnp.ndarray, scale: jnp.ndarray,
                       bias: jnp.ndarray, c: int):
    """Fold per-group mean/inv-std + learned affine into per-(sample, channel) a, b so
    the normalize pass is a single fused ``act(x * a + b)``."""
    g = mean_g.shape[-1]
    inv_c = jnp.repeat(inv_g, c // g, axis=-1)  # (N, C)
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)
    a = inv_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * a
    return a, b


def _sums_to_affine(s1: jnp.ndarray, s2: jnp.ndarray, scale: jnp.ndarray,
                    bias: jnp.ndarray, *, m: int, num_groups: int, eps: float):
    """Per-channel sum / sum-of-squares (N, C) -> affine a, b (one-pass variance)."""
    n, c = s1.shape
    g = num_groups
    n_elem = m * (c // g)
    gs1 = s1.reshape(n, g, c // g).sum(axis=-1)  # (N, G)
    gs2 = s2.reshape(n, g, c // g).sum(axis=-1)
    mean = gs1 / n_elem
    var = jnp.maximum(gs2 / n_elem - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return _affine_from_stats(mean, inv, scale, bias, c)


def group_norm_xla(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, *,
                   num_groups: int, eps: float, act: Optional[str] = None) -> jnp.ndarray:
    """GroupNorm over (N, M, C): pure-XLA bandwidth-friendly formulation (row-axis-only
    reductions). Fallback path and backward-recompute oracle."""
    n, m, c = x.shape
    g = num_groups
    if x.dtype == jnp.float32:
        # fp32 activations can have |mean| >> std, where one-pass E[x^2]-E[x]^2 loses
        # all precision — use the exact centered two-pass form (also keeps CPU golden
        # tests torch-exact)
        xg = x.reshape(n, m, g, c // g)
        n_elem = m * (c // g)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)  # (N, 1, G, 1)
        xc = xg - mean
        sumsq = jnp.einsum("nmgk,nmgk->ng", xc, xc, preferred_element_type=jnp.float32)
        inv = jax.lax.rsqrt(sumsq / n_elem + eps)  # (N, G)
        a, b = _affine_from_stats(mean.reshape(n, g), inv, scale, bias, c)
    else:
        # bf16: one pass over x — per-channel sum and sum-of-squares, fp32 accumulation,
        # reduction over the (major) row axis only: no minor-axis cross-lane reduce, and
        # XLA keeps both in one fusion with the producer's epilogue. One-pass variance is
        # safe here: bf16 quantization of x dominates the cancellation error. (An
        # MXU-matvec variant and a Pallas stats kernel were both measured net-slower
        # in-network: they break the conv+stats mega-fusions — BASELINE.md.)
        s1 = jnp.sum(x, axis=1, dtype=jnp.float32)  # (N, C)
        s2 = jnp.einsum("nmc,nmc->nc", x, x, preferred_element_type=jnp.float32)
        a, b = _sums_to_affine(s1, s2, scale, bias, m=m, num_groups=num_groups, eps=eps)
    # single fused elementwise epilogue in the compute dtype (fp32 temporaries of a full
    # upcast are several GB at video resolution and OOM HBM)
    y = x * a[:, None, :].astype(x.dtype) + b[:, None, :].astype(x.dtype)
    if act == "silu":
        y = jax.nn.silu(y)
    return y


def reference_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, *,
                         num_groups: int, eps: float, act: Optional[str]) -> jnp.ndarray:
    """Two-pass oracle (torch.nn.GroupNorm semantics) used by tests."""
    n, m, c = x.shape
    g = num_groups
    xg = x.astype(jnp.float32).reshape(n, m, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(n, m, c)
    y = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(x.dtype)
