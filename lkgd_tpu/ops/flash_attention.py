"""Pallas TPU flash attention — the spatial-attention hot kernel.

The reference leans on xformers' CUDA memory-efficient attention
(`/root/reference/train_models/train_svd_lora.py:1121-1133`). On TPU, XLA materializes the
(S, S) logits for SVD's top-level spatial attention (S = 72*128 = 9216 tokens -> 47 GB at
576x1024x14f, which OOMs a v5e chip), so this kernel computes attention with online
softmax over K/V blocks: O(S * block) VMEM, logits never hit HBM.

Non-causal, no mask (video spatial/temporal attention is dense). fp32 accumulators,
bf16-friendly inputs. Layout: (B, S, H, D) in/out — heads fold into the grid's batch dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _mask_if_padded(s, block_start, block_k, kv_valid):
    """Padded-key mask as an O(block_k) additive row bias, applied unconditionally.

    The previous form — per-element iota+cmp+select under a jax.lax.cond meant to skip
    fully-valid blocks — is PREDICATED by Mosaic: both branches execute on every block,
    and the kernel ran at 41.4 vs 82.3 TF/s at the CogVideoX shape (S=17776 padded to
    18432, BH=96; experiments/flash_mask_microbench.py). A (1, block_k) bias row
    (0 for valid columns, -inf for padding) broadcast-added into the logits fuses into
    the same epilogue as the bound subtract, costing one VPU add per element on every
    block — measured ~free next to the exp2."""
    pos = block_start + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
    bias = jnp.where(pos < kv_valid, 0.0, _NEG_INF).astype(s.dtype)
    return s + bias


def _flash_bound_kernel(q_ref, t_ref, k_ref, v_ref, o_ref, l_ref, l_scratch, acc_scratch,
                        *, scale: float, n_k_blocks: int, block_k: int, block_q: int,
                        kv_valid):
    """Softmax with a precomputed per-row upper bound instead of a running max.

    Softmax is invariant to the constant subtracted from the logits; it need not be the
    max — any per-row upper bound b_i >= max_j s_ij keeps exp2 in (0, 1]. The wrapper
    passes t_i = -scale*log2e * ||q_i|| * max_j ||k_j|| (Cauchy-Schwarz bound, O(S*D));
    the broadcast add of t fuses into the MXU output epilogue for free (measured), so the
    kernel runs NO max reduce, NO per-block rescaling, NO m bookkeeping: 77.6 vs 64.9
    TF/s for the max-tracking kernel at S=9216/D=64/BH=140 on v5e. (The exp2 itself is
    free — replacing it with a multiply does not change the runtime; BASELINE.md.)

    Numerics: identical softmax up to WHICH constant is subtracted — fp32 exp2/sum have
    the same relative precision at 2^-40 as at 2^0, so results match the max-tracking
    kernel to fp32 rounding. The only failure mode is bound looseness > ~149 log2 units
    (whole rows underflow); the wrapper detects it via the emitted row sums l (l_i >=
    2^(max_i - b_i)) and falls back to the max-tracking kernel under jax.lax.cond, so
    the fast path carries no accuracy risk at any input scale."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)
    t = t_ref[0, 0, :][:, None]  # (BQ, 1) f32 — per-row -bound, already in log2 domain

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (
                                scale * 1.4426950408889634) + t
    if kv_valid is not None:
        s = _mask_if_padded(s, j * block_k, block_k, kv_valid)

    p = jnp.exp2(s)  # (BQ, BK), in (0, ~1] by construction
    l_scratch[...] = l_scratch[...] + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_scratch.shape)
    acc_scratch[...] = acc_scratch[...] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == n_k_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[...] / l_scratch[:, :1]).astype(o_ref.dtype)
        # per-(batch, q-block) min row-sum — the underflow-guard signal; one (8, 128)
        # sublane tile per q block instead of the full (BH, S) row sums (whose
        # write-back costs ~2.5 ms/call at S=9216/BH=140; this is free). The tile is
        # the smallest block Mosaic accepts for the trailing two dims. Each (b, i)
        # writes its OWN block — no cross-iteration read-modify-write, so the i grid
        # dim stays safely 'parallel' even when Mosaic splits it across megacore TPUs.
        l_ref[0, 0] = jnp.broadcast_to(jnp.min(l_scratch[:, 0])[None, None], (8, 128))


def _bound_t(q, k, scale):
    """(BH,1,S_q) f32: minus the Cauchy-Schwarz logit upper bound, log2 domain."""
    kn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(k.astype(jnp.float32)), -1), axis=1))
    qn = jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), -1))  # (BH, S)
    return (-(qn * kn[:, None]) * (scale * 1.4426950408889634))[:, None, :]


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch, *,
                  scale: float, n_k_blocks: int, block_k: int, kv_valid):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)

    # softmax in the exp2 domain: fold scale*log2(e) into the logits so the VPU runs the
    # cheap pow2 instead of exp (the transcendental is the per-block bottleneck at D=64)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (scale * 1.4426950408889634)
    if kv_valid is not None:
        s = _mask_if_padded(s, j * block_k, block_k, kv_valid)

    m_prev = m_scratch[...]  # (BQ, 128) lane-replicated, log2 domain
    l_prev = l_scratch[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (BQ, 1)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp2(m_prev - m_next)  # (BQ, 128)
    p = jnp.exp2(s - m_next[:, :1])  # (BQ, BK)
    l_next = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape)

    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    @pl.when(j == n_k_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[...] / l_scratch[:, :1]).astype(o_ref.dtype)


# ------------------------------------------------------------------ backward pass
# Standard flash-attention VJP with the log2-domain logsumexp saved by the forward:
#   P_ij = exp2(s2_ij - L2_i)   (== natural softmax probabilities)
#   dV = P^T dO;  dP = dO V^T;  dS = P * (dP - delta),  delta_i = rowsum(dO * O)_i
#   dQ = dS K * scale;  dK = dS^T Q * scale
_LOG2E = 1.4426950408889634


def _flash_bound_lse_kernel(q_ref, t_ref, k_ref, v_ref, o_ref, lse_ref, *, scale,
                            block_k, block_q, kv_valid):
    """Training-forward variant of _flash_bound_kernel: bound subtraction instead of a
    running max, emitting the true log2-domain logsumexp (lse = log2(l) - t, since
    t = -bound). Guarded by the wrapper via min(lse + t) — no extra outputs needed."""
    i = pl.program_id(1)
    s_k = k_ref.shape[1]
    n_k = s_k // block_k
    q = q_ref[0]
    t = t_ref[0, 0, :][:, None]  # (BQ, 1) f32, log2 domain, = -bound

    def k_loop(ki, carry):
        l_prev, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (scale * _LOG2E) + t
        if kv_valid is not None:
            s = _mask_if_padded(s, ki * block_k, block_k, kv_valid)
        p = jnp.exp2(s)
        l_next = l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return l_next, acc

    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc0 = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    l, acc = jax.lax.fori_loop(0, n_k, k_loop, (l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0, pl.ds(i * block_q, block_q)] = (jnp.log2(l) - t)[:, 0]


def _flash_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k,
                          block_q, kv_valid):
    i = pl.program_id(1)
    s_k = k_ref.shape[1]
    n_k = s_k // block_k
    q = q_ref[0]

    def k_loop(ki, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (scale * _LOG2E)
        if kv_valid is not None:
            s = _mask_if_padded(s, ki * block_k, block_k, kv_valid)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_next, l_next, acc

    m0 = jnp.full((q.shape[0], 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc0 = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_k, k_loop, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # log2-domain logsumexp; lse lives as (BH, 1, S) (full-row block, sliced per q block
    # — 2D (1, BQ) output blocks violate the TPU (8, 128) tiling rule)
    lse_ref[0, 0, pl.ds(i * block_q, block_q)] = (m + jnp.log2(l))[:, 0]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                         scale, block_k, block_q, kv_valid):
    i = pl.program_id(1)
    s_k = k_ref.shape[1]
    n_k = s_k // block_k
    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]  # (BQ, 1)
    delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]

    def k_loop(ki, dq):
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (scale * _LOG2E)
        if kv_valid is not None:
            s = _mask_if_padded(s, ki * block_k, block_k, kv_valid)
        p = jnp.exp2(s - lse)  # (BQ, BK)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, n_k, k_loop, jnp.zeros(q.shape, jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                          *, scale, block_q, block_k, kv_valid):
    s_q = q_ref.shape[1]
    n_q = s_q // block_q
    j = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]

    def q_loop(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (scale * _LOG2E)
        if kv_valid is not None:
            s = _mask_if_padded(s, j * block_k, block_k, kv_valid)
        p = jnp.exp2(s - lse)  # (BQ, BK)
        dv = dv + jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)  # (BQ, BK)
        dk = dk + jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, q_loop, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "kv_valid"))
def _flash_fwd_lse_bhsd(q, k, v, block_q, block_k, kv_valid=None):
    import os

    bh, s_q, d = q.shape
    if not os.environ.get("LKGD_FLASH_MAXTRACK"):
        s_k = k.shape[1]
        scale = d**-0.5
        t = _bound_t(q, k, scale)
        kernel = functools.partial(_flash_bound_lse_kernel, scale=scale, block_k=block_k,
                                   block_q=block_q, kv_valid=kv_valid)
        out, lse = pl.pallas_call(
            kernel,
            grid=(bh, s_q // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
                pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0)),
            ],
            out_specs=(pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                       pl.BlockSpec((1, 1, s_q), lambda b, i: (b, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
                       jax.ShapeDtypeStruct((bh, 1, s_q), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(q, t, k, v)
        # lse + t = log2(row sum); underflowing rows mean the bound was pathologically
        # loose -> redo with the online-max kernel (never taken at sane activations)
        return jax.lax.cond(
            jnp.min(lse + t) > -110.0,
            lambda q, k, v, o, l: (o, l),
            lambda q, k, v, o, l: _flash_fwd_lse_maxtrack_bhsd(
                q, k, v, block_q, block_k, kv_valid),
            q, k, v, out, lse)
    return _flash_fwd_lse_maxtrack_bhsd(q, k, v, block_q, block_k, kv_valid)


def _flash_fwd_lse_maxtrack_bhsd(q, k, v, block_q, block_k, kv_valid):
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    kernel = functools.partial(_flash_fwd_lse_kernel, scale=d**-0.5, block_k=block_k,
                               block_q=block_q, kv_valid=kv_valid)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, s_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                   pl.BlockSpec((1, 1, s_q), lambda b, i: (b, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, 1, s_q), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(q, k, v)
    return out, lse


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "kv_valid"))
def _flash_bwd_bhsd(q, k, v, do, lse, delta, block_q, block_k, kv_valid=None):
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=d**-0.5, block_k=block_k,
                          block_q=block_q, kv_valid=kv_valid),
        grid=(bh, s_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, s_q), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, s_q), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=d**-0.5, block_q=block_q,
                          block_k=block_k, kv_valid=kv_valid),
        grid=(bh, s_k // block_k),
        in_specs=[
            pl.BlockSpec((1, s_q, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, s_q, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, s_q), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, s_q), lambda b, j: (b, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0)),
                   pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0))),
        out_shape=(jax.ShapeDtypeStruct((bh, s_k, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, s_k, d), v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


def _vmem_bytes(bq: int, bk: int, d: int) -> int:
    """Rough VMEM footprint: double-buffered q/k/v/o blocks (bf16) + m/l/acc scratch +
    fp32 logits/probs intermediates."""
    io = 2 * (bq * d + 2 * bk * d) * 2 + 2 * bq * d * 2
    scratch = bq * 128 * 4 * 2 + bq * d * 4
    inter = 2 * bq * bk * 4
    return io + scratch + inter


_VMEM_LIMIT = 12 * 1024 * 1024


_BLOCK_CANDIDATES = (1024, 768, 512, 384, 256, 128)
# Rough measured TF/s per block size on v5e at D=64 (BASELINE.md block sweeps: (1024,1024)
# 41.3, (768,768)/(1536,1536) ~40, (512,512) 25.9, (256,256) ~23; 128 extrapolated). Used
# only as relative weights to trade block size against padding waste.
_BLOCK_EFF = {1024: 41.0, 768: 38.0, 512: 26.0, 384: 24.0, 256: 23.0, 128: 12.0}


def _plan_blocks(s_q: int, s_k: int, d: int):
    """Jointly choose (block_q, block_k) and padded lengths (sq_p, sk_p).

    Minimizes padded work / block efficiency, so an already-tileable length is never
    padded just to reach a bigger block (S=2304 stays at (768, 768) — measured ~3x the
    (256, 256) fallback — instead of padding to 3072 for (1024, 1024)), while a
    non-tileable length (CogVideoX S=17776) pads up to the cheapest tiling.
    Returns (bq, bk, sq_p, sk_p) or None if nothing fits VMEM."""
    best = None
    for bq in _BLOCK_CANDIDATES:
        sq_p = -(-s_q // bq) * bq
        for bk in _BLOCK_CANDIDATES:
            sk_p = -(-s_k // bk) * bk
            if _vmem_bytes(bq, bk, d) > _VMEM_LIMIT:
                continue
            eff = min(_BLOCK_EFF[bq], _BLOCK_EFF[bk])
            cost = sq_p * sk_p / eff
            if best is None or cost < best[0]:
                best = (cost, bq, bk, sq_p, sk_p)
    return None if best is None else best[1:]


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "kv_valid"))
def _flash_bhsd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block_q: int, block_k: int,
                kv_valid=None) -> jnp.ndarray:
    """(BH, S_q, D) x (BH, S_k, D) -> (BH, S_q, D). ``kv_valid``: number of real keys
    when the sequence was padded up to the block multiple (None = no padding).

    Default path: bound-subtraction kernel (no running max; see _flash_bound_kernel).
    ``LKGD_FLASH_MAXTRACK=1`` restores the online-max kernel."""
    import os

    bh, s_q, d = q.shape
    s_k = k.shape[1]
    scale = d**-0.5
    n_q, n_k = s_q // block_q, s_k // block_k
    grid = (bh, n_q, n_k)

    if not os.environ.get("LKGD_FLASH_MAXTRACK"):
        t = _bound_t(q, k, scale)
        kernel = functools.partial(_flash_bound_kernel, scale=scale, n_k_blocks=n_k,
                                   block_k=block_k, block_q=block_q, kv_valid=kv_valid)
        out, l = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=(pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                       pl.BlockSpec((1, 1, 8, 128), lambda b, i, j: (b, i, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
                       jax.ShapeDtypeStruct((bh, n_q, 8, 128), jnp.float32)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(q, t, k, v)
        # row sums satisfy l_i >= 2^(s_max_i - b_i); if any row's bound was loose by
        # > ~110 log2 units (pathological q/k scales), redo with the max-tracking kernel
        # — cond picks one branch at runtime, so the common case pays only the min-reduce
        return jax.lax.cond(
            jnp.min(l) > 2.0 ** -110,
            lambda q, k, v, o: o,
            lambda q, k, v, o: _flash_maxtrack_bhsd(q, k, v, block_q, block_k, kv_valid),
            q, k, v, out)

    return _flash_maxtrack_bhsd(q, k, v, block_q, block_k, kv_valid)


def _flash_maxtrack_bhsd(q, k, v, block_q, block_k, kv_valid):
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    scale = d**-0.5
    n_q, n_k = s_q // block_q, s_k // block_k
    grid = (bh, n_q, n_k)
    kernel = functools.partial(_flash_kernel, scale=scale, n_k_blocks=n_k,
                               block_k=block_k, kv_valid=kv_valid)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v)


def supports(q_shape, k_shape) -> bool:
    """Whether the kernel handles these (B, S, H, D) shapes (padding any sequence up to
    a block multiple, with padded keys masked out of the softmax)."""
    s_q, s_k, d = q_shape[1], k_shape[1], q_shape[3]
    if d % 8 != 0 or d > 512:
        return False
    return _plan_blocks(s_q, s_k, d) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(qt, kt, vt, block_q, block_k, kv_valid=None):
    return _flash_bhsd(qt, kt, vt, block_q, block_k, kv_valid)


def _flash_core_fwd(qt, kt, vt, block_q, block_k, kv_valid):
    out, lse = _flash_fwd_lse_bhsd(qt, kt, vt, block_q, block_k, kv_valid)
    return out, (qt, kt, vt, out, lse)


def _flash_core_bwd(block_q, block_k, kv_valid, res, g):
    qt, kt, vt, out, lse = res
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (BH, S)
    dq, dk, dv = _flash_bwd_bhsd(qt, kt, vt, g.astype(qt.dtype), lse, delta[:, None, :],
                                 block_q, block_k, kv_valid)
    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ------------------------------------------------------------------ layout firewall
# The flash kernels want (B*H, S, D) operands; the network computes (B, S, H*D)
# projections. A plain jnp.transpose lets XLA "optimize" the copy away by assigning
# head-major physical layouts to the projection outputs — and layout assignment then
# propagates those transposed layouts through the whole UNet (measured on v5e: LayerNorms
# at ~20-30 GB/s, temporal matmuls emitted as 10 TF/s convolutions; see BASELINE.md).
# These relayout kernels do the same data movement as an explicit copy, but a Pallas
# custom call has FIXED standard operand/result layouts, so the layout poison cannot
# cross it in either direction.
def _split_heads_kernel(x_ref, o_ref, *, heads: int, d: int):
    xb = x_ref[0]
    for h in range(heads):
        o_ref[h] = xb[:, h * d:(h + 1) * d]


def _merge_heads_kernel(x_ref, o_ref, *, heads: int, d: int):
    for h in range(heads):
        o_ref[0, :, h * d:(h + 1) * d] = x_ref[h]


def _pick_seq_block(s: int, c: int, itemsize: int) -> int:
    """Largest sequence block dividing s whose (rows, c) tile fits the VMEM budget
    (split/merge hold one input and one output block, double-buffered)."""
    for bs in (1024, 512, 256, 128, 64, 32, 16, 8):
        if s % bs == 0 and bs * c * itemsize <= 2 * 1024 * 1024:
            return bs
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B, S, H*D) -> (B*H, S, D), both in standard layout."""
    b, s, c = x.shape
    d = c // heads
    bs = _pick_seq_block(s, c, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_split_heads_kernel, heads=heads, d=d),
        grid=(b, s // bs),
        in_specs=[pl.BlockSpec((1, bs, c), lambda b, i: (b, i, 0))],
        out_specs=pl.BlockSpec((heads, bs, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * heads, s, d), x.dtype),
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _merge_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B*H, S, D) -> (B, S, H*D), both in standard layout."""
    bh, s, d = x.shape
    b = bh // heads
    bs = _pick_seq_block(s, heads * d, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_merge_heads_kernel, heads=heads, d=d),
        grid=(b, s // bs),
        in_specs=[pl.BlockSpec((heads, bs, d), lambda b, i: (b, i, 0))],
        out_specs=pl.BlockSpec((1, bs, heads * d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, heads * d), x.dtype),
    )(x)


def _split_heads_fwd(x, heads):
    return _split_heads(x, heads), None


def _split_heads_bwd(heads, _, g):
    return (_merge_heads(g, heads),)


def _merge_heads_fwd(x, heads):
    return _merge_heads(x, heads), None


def _merge_heads_bwd(heads, _, g):
    return (_split_heads(g, heads),)


_split_heads.defvjp(_split_heads_fwd, _split_heads_bwd)
_merge_heads.defvjp(_merge_heads_fwd, _merge_heads_bwd)


# --------------------------------------------------------------- SPMD mesh sharding
# A Mosaic custom call cannot be partitioned by XLA's SPMD pass — compiling the UNet
# under jit-over-mesh (the v5e-8 joint deployment, bench.py LKGD_BENCH_MESH=joint) dies
# with "Mosaic kernels cannot be automatically partitioned". Both flash entry points
# therefore wrap themselves in ``jax.shard_map`` whenever tracing under an active mesh
# (``jax.set_mesh``), assigning each Auto mesh axis to the dimension the deployment
# shardings actually use:
#
#   * batch dim first — spatial attention's batch is rows*T, which row-major-flattens
#     the (data, context)-sharded (rows, T) sample, so a P(("data", "context")) batch
#     spec matches the incoming sharding exactly: a zero-collective annotation handing
#     each chip its local rows;
#   * head dim for axes the batch can't absorb — megatron-style TP (parallel/tp.py)
#     column-shards to_q/to_k/to_v, so q/k/v arrive head-sharded over ``model``;
#   * if neither divides, a fully-replicated manual region (every device computes the
#     whole call redundantly) — never optimal, but it compiles and is only reachable
#     for degenerate shapes.
#
# Axes already mapped by an enclosing shard_map (ring/Ulysses SP, pp.py) show up as
# Manual and are skipped, so nesting is safe.


def _auto_shard_axes(b: int, h: int):
    """(mesh, batch_axes, head_axes) for sharding a (B, S, H, D) flash call over the
    active mesh's Auto axes at trace time; (None, (), ()) when there is no active mesh.

    Axes are assigned batch-first by divisibility: operand shardings are not visible on
    tracer avals at this point, so the choice is static. For the deployment layouts this
    matches the data (data/context-sharded rows·T batch, replicated heads). Caveat: on a
    megatron-TP mesh where q/k/v arrive *head*-sharded over 'model', a batch divisible by
    the model-axis size absorbs that axis here and the in_specs force a reshard around
    the kernel (numerics unaffected). TP layouts therefore rely on batch not being
    divisible by the model axis (true for the served TP configs: batch 2 rows, model=4);
    if that changes, pass explicit specs by calling _spmd_wrap directly."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.axis_names:
        return None, (), ()
    from jax.sharding import AxisType

    baxes, haxes = [], []
    bprod = hprod = 1
    any_auto = False
    for name, t in zip(mesh.axis_names, mesh.axis_types):
        if t != AxisType.Auto or mesh.shape[name] == 1:
            continue
        any_auto = True
        size = mesh.shape[name]
        if b % (bprod * size) == 0:
            baxes.append(name)
            bprod *= size
        elif h % (hprod * size) == 0:
            haxes.append(name)
            hprod *= size
    if not any_auto:
        return None, (), ()
    return mesh, tuple(baxes), tuple(haxes)


def _spmd_wrap(fn, mesh, baxes, haxes, n_lse: int):
    """shard_map ``fn(q, k, v)`` with the (B, S, H, D) batch/head dims mapped over
    ``baxes``/``haxes`` (either may be empty — fully replicated manual region when both
    are). ``n_lse``: number of trailing (B, S, H) outputs after the (B, S, H, D) one."""
    from jax.sharding import PartitionSpec as P

    spec = P(baxes or None, None, haxes or None, None)
    lse_spec = P(baxes or None, None, haxes or None)
    out_specs = spec if n_lse == 0 else (spec,) + (lse_spec,) * n_lse
    return jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=out_specs, check_vma=False)


def flash_attention_with_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """(B, S, H, D) attention returning (out, lse2) where ``lse2`` (B, S_q, H, fp32) is the
    log2-domain logsumexp of the scaled logits. Forward-only (no custom VJP) — used by
    ring attention (parallel/sequence.py) to combine per-K/V-block partial softmaxes
    exactly: out = Σ_blk out_blk · 2^(lse_blk − LSE). Under an active mesh the call is
    shard_mapped over the batch/head dims (see _auto_shard_axes)."""
    mesh, baxes, haxes = _auto_shard_axes(q.shape[0], q.shape[2])
    if mesh is not None:
        return _spmd_wrap(_flash_with_lse_local, mesh, baxes, haxes, 1)(q, k, v)
    return _flash_with_lse_local(q, k, v)


def _flash_with_lse_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    plan = _plan_blocks(s_q, s_k, d)
    if plan is None:
        raise ValueError(f"unsupported flash shapes S_q={s_q}, S_k={s_k}, D={d}")
    bq, bk, sq_p, sk_p = plan
    if sq_p != s_q or sk_p != s_k:
        q = jnp.pad(q, ((0, 0), (0, sq_p - s_q), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, sk_p - s_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - s_k), (0, 0), (0, 0)))
    kv_valid = s_k if sk_p != s_k else None
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq_p, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk_p, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk_p, d)
    out, lse = _flash_fwd_lse_bhsd(qt, kt, vt, bq, bk, kv_valid)
    out = out.reshape(b, h, sq_p, d).transpose(0, 2, 1, 3)[:, :s_q]
    lse = lse.reshape(b, h, sq_p).transpose(0, 2, 1)[:, :s_q]  # (B, S_q, H)
    return out, lse


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) softmax attention via the Pallas kernel. Differentiable: a custom VJP
    recomputes the probabilities per block from the saved logsumexp (standard flash
    backward; two kernels for dQ and dK/dV). Head split/merge run as Pallas relayout
    kernels so surrounding ops keep standard layouts (see the layout-firewall note).
    Under an active mesh the call is shard_mapped over the batch/head dims (see
    _auto_shard_axes) so the SPMD partitioner never sees the Mosaic custom call."""
    mesh, baxes, haxes = _auto_shard_axes(q.shape[0], q.shape[2])
    if mesh is not None:
        return _spmd_wrap(_flash_attention_local, mesh, baxes, haxes, 0)(q, k, v)
    return _flash_attention_local(q, k, v)


def _flash_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    # sequences that no block tiles (e.g. CogVideoX's 17776 video+text tokens) are padded
    # up to a block multiple; padded keys are masked to -inf inside the kernels and
    # padded query rows are sliced off (their gradients are exactly zero because the
    # padded output rows receive zero cotangents through jnp.pad's VJP)
    plan = _plan_blocks(s_q, s_k, d)
    if plan is None:
        raise ValueError(f"unsupported flash shapes S_q={s_q}, S_k={s_k}, D={d}")
    bq, bk, sq_p, sk_p = plan
    if sq_p != s_q or sk_p != s_k:
        q = jnp.pad(q, ((0, 0), (0, sq_p - s_q), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, sk_p - s_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - s_k), (0, 0), (0, 0)))
    kv_valid = s_k if sk_p != s_k else None
    itemsize = q.dtype.itemsize
    firewall = (h > 1 and _pick_seq_block(sq_p, h * d, itemsize) > 0
                and _pick_seq_block(sk_p, h * d, itemsize) > 0)
    if h == 1:
        qt = q.reshape(b, sq_p, d)
        kt = k.reshape(b, sk_p, d)
        vt = v.reshape(b, sk_p, d)
    elif firewall:
        qt = _split_heads(q.reshape(b, sq_p, h * d), h)
        kt = _split_heads(k.reshape(b, sk_p, h * d), h)
        vt = _split_heads(v.reshape(b, sk_p, h * d), h)
    else:
        # wide-channel shapes whose split/merge blocks would not fit VMEM: plain
        # transposes (XLA may choose head-major layouts around them — acceptable for
        # the rare configs that land here)
        qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq_p, d)
        kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk_p, d)
        vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk_p, d)
    out = _flash_core(qt, kt, vt, bq, bk, kv_valid)
    if h == 1:
        out = out.reshape(b, sq_p, h, d)
    elif firewall:
        out = _merge_heads(out, h).reshape(b, sq_p, h, d)
    else:
        out = out.reshape(b, h, sq_p, d).transpose(0, 2, 1, 3)
    return out[:, :s_q]
