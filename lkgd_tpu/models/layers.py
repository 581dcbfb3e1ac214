"""Common neural-net layers for the TPU-native LKGD model zoo.

These re-implement (channels-last, functional, statically-configured) the diffusers layer
vocabulary the reference builds on: sinusoidal timestep embeddings, GEGLU feed-forward,
multi-head attention with *fused LoRA adapters and stream-gated routing*, and the
AlphaBlender spatial/temporal mixer. Reference behavior sources are cited per class.

Design notes (SURVEY.md §7):
  * LoRA is not a runtime monkey-patch (reference `patch/patch.py:57-92`) but a static part
    of each projection: ``y = x @ W + sum_a gate_a * (x @ A_a) @ B_a * scale_a`` where
    ``gate_a`` is a per-row 0/1 vector derived from a *static* stream mask — XLA fuses the
    low-rank matmuls into the main projection's epilogue.
  * Stream-batch convention: the leading batch axis is ordered stream-major — rows
    ``[s0*inner, s1*inner, ...]`` — so a stream mask of length S gates ``rows // S``
    contiguous rows each, matching the reference's ``repeat_interleave`` semantics
    (`patch/patch.py:77,459`).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- embeddings
def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal embeddings matching diffusers' ``Timesteps`` (used at reference
    `models/unet_spatio_temporal_condition.py:139,144`). Always fp32."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP over the sinusoidal embedding (diffusers ``TimestepEmbedding``)."""

    time_embed_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        x = nn.Dense(self.out_dim or self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


# --------------------------------------------------------------------------- LoRA
@dataclasses.dataclass(frozen=True)
class LoraSpec:
    """A single adapter on one projection. ``streams`` is the static stream mask: entry s
    gates the s-th contiguous block of rows; empty tuple = apply to every row."""

    name: str
    rank: int = 4
    alpha: float = 4.0
    streams: Tuple[int, ...] = ()

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def stream_gate(mask: Sequence[int], rows: int, dtype) -> jnp.ndarray:
    """Expand a stream-level 0/1 mask to per-row gains (reference repeat_interleave)."""
    m = jnp.asarray(mask, dtype=dtype)
    return jnp.repeat(m, rows // len(mask), total_repeat_length=rows)


class DenseWithLora(nn.Module):
    """Dense layer with zero or more statically-routed LoRA adapters folded in."""

    features: int
    use_bias: bool = True
    adapters: Tuple[LoraSpec, ...] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (in_features, self.features))
        y = jnp.dot(x, kernel.astype(self.dtype), preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        for spec in self.adapters:
            a = self.param(f"lora_{spec.name}_A", nn.initializers.he_uniform(), (in_features, spec.rank))
            b = self.param(f"lora_{spec.name}_B", nn.initializers.zeros, (spec.rank, self.features))
            delta = jnp.dot(jnp.dot(x, a.astype(self.dtype)), b.astype(self.dtype)) * spec.scaling
            if spec.streams:
                gate = stream_gate(spec.streams, x.shape[0], self.dtype)
                delta = delta * gate.reshape((-1,) + (1,) * (x.ndim - 1))
            y = y + delta
        return y


# --------------------------------------------------------------------------- attention
# NOTE: a fused-QKV path (q/k/v as one (C, 3*H*D) matmul + packed-split Pallas firewall)
# was built in round 2 on the theory that the three N=320 dots at 24 TF/s would run at
# the ~63 TF/s wide-dot rate. Measured on v5e (BENCH r3 A/B): 27.03 s/clip fused vs
# 26.89 s unfused — a 0.5% LOSS (XLA already co-schedules the three dots against the
# same activations; the packed split costs more than the wide dot saves). Deleted; the
# measurement lives in BASELINE.md "Session 7".
def scaled_dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, S, H, D) attention. Delegates to XLA's fused path; a Pallas flash-attention
    kernel plugs in behind the same signature (lkgd_tpu.ops.attention)."""
    from lkgd_tpu.ops.attention import dot_product_attention

    return dot_product_attention(q, k, v, mask=mask)


class Attention(nn.Module):
    """Multi-head attention mirroring diffusers ``Attention`` as configured by SVD:
    no q/k/v bias, output projection with bias, scale = head_dim**-0.5.

    ``adapters_*`` carry the statically-resolved LoRA specs for each projection (the
    reference routes adapters per-projection with inverted masks on the joint K/V —
    `patch/patch.py:892-895` — which the caller encodes directly in these specs).
    """

    query_dim: int
    heads: int
    dim_head: int
    kv_dim: Optional[int] = None  # cross-attention context dim; None = self
    out_bias: bool = True
    adapters_q: Tuple[LoraSpec, ...] = ()
    adapters_k: Tuple[LoraSpec, ...] = ()
    adapters_v: Tuple[LoraSpec, ...] = ()
    adapters_out: Tuple[LoraSpec, ...] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray,
                 encoder_hidden_states: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        q = DenseWithLora(inner, use_bias=False, adapters=self.adapters_q, dtype=self.dtype,
                          name="to_q")(hidden_states)
        k = DenseWithLora(inner, use_bias=False, adapters=self.adapters_k, dtype=self.dtype,
                          name="to_k")(ctx)
        v = DenseWithLora(inner, use_bias=False, adapters=self.adapters_v, dtype=self.dtype,
                          name="to_v")(ctx)

        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        if sk == 1 and mask is None:
            # single-key context (SVD cross-attention: the CLIP image embedding is ONE
            # token — reference pipeline...trans.py:188 unsqueeze(1)): softmax over one
            # key is identically 1, so attention reduces EXACTLY to broadcasting v.
            # to_out runs on the (B, 1, C) token and broadcasts after (linear commutes
            # with broadcast); q is dead code and XLA eliminates the to_q matmul.
            # Measured: removes the cross-attn QK/PV work from every spatial+temporal
            # block (BASELINE.md round-4 session).
            out = DenseWithLora(self.query_dim, use_bias=self.out_bias,
                                adapters=self.adapters_out, dtype=self.dtype,
                                name="to_out")(v)
            return jnp.broadcast_to(out, (b, sq, out.shape[-1]))
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        out = out.reshape(b, sq, inner)
        return DenseWithLora(self.query_dim, use_bias=self.out_bias, adapters=self.adapters_out,
                             dtype=self.dtype, name="to_out")(out)


class FrameAxisAttention(nn.Module):
    """Attention over the *frame* axis of spatial-major ``(B*T, HW, C)`` tokens.

    The reference's temporal attention transposes to ``(B*HW, T, C)`` tokens
    (`patch/patch.py:592-597` via diffusers TemporalBasicTransformerBlock). On TPU that
    logical transpose never materializes — XLA propagates the strided layout into every
    downstream op instead (LayerNorm reductions at ~20 GB/s, token matmuls emitted as
    10 TF/s convolutions; measured on v5e, see BASELINE.md). This module keeps all
    projections in the standard spatial-major layout and contracts the frame axis through
    dot_general batch dimensions, so only the tiny (T x T) attention core ever sees the
    frame axis.

    Parameter layout matches :class:`Attention` (to_q/to_k/to_v/to_out), so module trees
    and ported weights are interchangeable.

    ``encoder_hidden_states``: None (self-attention over frames), an ``(B*T, HW, C)``
    partner stream (joint attention), or — with ``per_sample_ctx=True`` — a per-sample
    ``(B, L, kv_dim)`` context (cross-attention; the reference broadcasts this to every
    pixel, here the K/V projections run once per sample instead of once per pixel).
    """

    query_dim: int
    heads: int
    dim_head: int
    kv_dim: Optional[int] = None
    out_bias: bool = True
    adapters_q: Tuple[LoraSpec, ...] = ()
    adapters_k: Tuple[LoraSpec, ...] = ()
    adapters_v: Tuple[LoraSpec, ...] = ()
    adapters_out: Tuple[LoraSpec, ...] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, num_frames: int,
                 encoder_hidden_states: Optional[jnp.ndarray] = None,
                 per_sample_ctx: bool = False) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        bt, hw, _ = hidden_states.shape
        b = bt // num_frames
        q = DenseWithLora(inner, use_bias=False, adapters=self.adapters_q,
                          dtype=self.dtype, name="to_q")(hidden_states)
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        k = DenseWithLora(inner, use_bias=False, adapters=self.adapters_k,
                          dtype=self.dtype, name="to_k")(ctx)
        v = DenseWithLora(inner, use_bias=False, adapters=self.adapters_v,
                          dtype=self.dtype, name="to_v")(ctx)
        if per_sample_ctx and k.shape[1] == 1:
            # single-key per-sample context (SVD: one CLIP token) — softmax over one
            # key == 1 exactly; attention collapses to broadcasting v per sample. See
            # the identical shortcut in Attention above.
            out = DenseWithLora(self.query_dim, use_bias=self.out_bias,
                                adapters=self.adapters_out, dtype=self.dtype,
                                name="to_out")(v)  # (B, 1, C)
            out = jnp.broadcast_to(out[:, None], (b, num_frames, hw, out.shape[-1]))
            return out.reshape(bt, hw, out.shape[-1])
        qh = q.reshape(b, num_frames, hw, self.heads, self.dim_head)
        if per_sample_ctx:
            # (B, L, inner): one K/V per sample, shared by all pixels
            kh = k.reshape(b, -1, self.heads, self.dim_head)
            vh = v.reshape(b, -1, self.heads, self.dim_head)
            logits = jnp.einsum("bqphd,blhd->bphql", qh, kh,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bphql,blhd->bqphd", probs, vh,
                             preferred_element_type=self.dtype)
        elif os.environ.get("LKGD_TEMPORAL_EINSUM"):
            # pre-r4 formulation kept for A/B: batched einsum with non-leading batch
            # dims (b, p, h) — XLA lowers it through full physical transposes of
            # q/k/v/out (measured 126 ms/step aggregate;
            # experiments/temporal_attention_microbench.py)
            kh = k.reshape(b, num_frames, hw, self.heads, self.dim_head)
            vh = v.reshape(b, num_frames, hw, self.heads, self.dim_head)
            logits = jnp.einsum("bqphd,bkphd->bphqk", qh, kh,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bphqk,bkphd->bqphd", probs, vh,
                             preferred_element_type=self.dtype)
        else:
            # token-major formulation: ONE explicit transpose each way and a
            # leading-batch (N, T, D) attention core — measured ~25% faster than the
            # batched-einsum lowering at every UNet level (the transposes are the same
            # data movement, but XLA's flat batched dot inserts none of its own)
            def to_tok(x):
                x = x.reshape(b, num_frames, hw, self.heads, self.dim_head)
                return x.transpose(0, 2, 3, 1, 4).reshape(
                    b * hw * self.heads, num_frames, self.dim_head)

            qt, kt, vt = to_tok(q), to_tok(k), to_tok(v)
            logits = jnp.einsum("ntd,nsd->nts", qt, kt,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("nts,nsd->ntd", probs, vt,
                             preferred_element_type=self.dtype)
            out = out.reshape(b, hw, self.heads, num_frames, self.dim_head)
            out = out.transpose(0, 3, 1, 2, 4)
        out = out.reshape(bt, hw, inner)
        return DenseWithLora(self.query_dim, use_bias=self.out_bias, adapters=self.adapters_out,
                             dtype=self.dtype, name="to_out")(out)


# --------------------------------------------------------------------------- feed-forward
class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # torch F.gelu default is the exact erf formulation
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU MLP (diffusers ``FeedForward`` with activation_fn="geglu", mult=4)."""

    dim_out: Optional[int] = None
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = x.shape[-1] * self.mult
        h = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim_out or x.shape[-1], dtype=self.dtype, name="net_2")(h)


# --------------------------------------------------------------------------- mixers
class AlphaBlender(nn.Module):
    """Learned scalar spatial/temporal mixer (diffusers ``AlphaBlender``,
    merge_strategy="learned_with_images"). ``image_only_indicator`` rows flagged 1 force
    pure-spatial mixing (used when training on images); video rows use sigmoid(mix)."""

    alpha: float = 0.5
    switch_spatial_to_temporal_mix: bool = False

    @nn.compact
    def __call__(self, x_spatial: jnp.ndarray, x_temporal: jnp.ndarray,
                 image_only_indicator: jnp.ndarray) -> jnp.ndarray:
        mix = self.param("mix_factor", lambda *_: jnp.full((1,), self.alpha), (1,))
        # image_only_indicator: (B, T)
        alpha = jnp.where(image_only_indicator.astype(bool), 1.0, jax.nn.sigmoid(mix)[0])
        if x_spatial.ndim == 4:  # (B, T, HW, C) — resblock layout
            alpha = alpha[:, :, None, None]
        elif x_spatial.ndim == 3:  # (B*T, HW, C) — transformer layout: per-frame scalar
            alpha = alpha.reshape(-1)[:, None, None]
        else:
            raise ValueError(f"unsupported ndim {x_spatial.ndim}")
        alpha = alpha.astype(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


# --------------------------------------------------------------------------- norms
class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis, with an optional fused activation.

    Backed by lkgd_tpu.ops.group_norm: row-axis-only fp32 reductions (no minor-axis
    cross-lane reduce), one-pass variance, and a single fused ``act(x * a + b)``
    epilogue in the compute dtype — the fp32 temporaries of a naive upcast are several
    GB at full video resolution (VAE decode at 576x1024 OOMs HBM otherwise)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    act: Optional[str] = None  # None | "silu" — fused into the normalize pass

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        from lkgd_tpu.ops.group_norm import group_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if os.environ.get("LKGD_SKIP_GN_STATS"):  # perf-bisection debug hook only
            y = (x * scale.astype(x.dtype) + bias.astype(x.dtype)).astype(self.dtype)
            return nn.silu(y) if self.act == "silu" else y
        n, m = x.shape[0], math.prod(x.shape[1:-1])
        y = group_norm(x.reshape(n, m, c), scale, bias, num_groups=self.num_groups,
                       eps=self.epsilon, act=self.act)
        return y.reshape(x.shape).astype(self.dtype)


class LayerNorm(nn.LayerNorm):
    """nn.LayerNorm with torch-compatible defaults (eps 1e-5, fp32 params). Params live
    directly at <name>/scale|bias so ported diffusers norms map 1:1."""

    epsilon: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32


class AdaLayerNormContinuous(nn.Module):
    """AdaLN with continuous conditioning (reference joint-attention ``norm1n`` when
    ``add_norm`` is set — `patch/patch.py:163-169`): ``LN(x) * (1+scale) + shift`` with
    (shift, scale) from a SiLU+Linear on the conditioning embedding, zero-init."""

    embedding_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, conditioning: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Dense(2 * self.embedding_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="linear")(nn.silu(conditioning))
        shift, scale = jnp.split(emb, 2, axis=-1)
        h = LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype, epsilon=1e-6, name="norm")(x)
        return h * (1.0 + scale[:, None, :]) + shift[:, None, :]
