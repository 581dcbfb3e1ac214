"""CogVideoX 3D transformer (DiT) with LKGD latent-knowledge fusion — TPU-native.

Re-implements the reference's modified CogVideoX-5B I2V transformer
(`/root/reference/CogVideo-main/finetune/models/cogvideox_i2v/cogvideox_transformer_3d.py`):
patchified video latents joined with T5 text tokens in a single attention stream, adaLN-zero
conditioning from the timestep, qk layernorm, 3D rotary embeddings on the video tokens,
and the quaternion+FFT fusion applied to the T5 context before patch embedding
(reference :337-366 for module defs, :520-585 for the forward-path injection; the fusion's
recombine MLP is 1024->512->4096 with a zero-init output so a fresh model is exactly the
base CogVideoX).

Layout: ``hidden_states`` (B, T, H, W, C) latent video (channels-last), ``encoder_hidden_states``
(B, L, 4096) T5 features. Sequence-parallel inference (the reference's xDiT
Ulysses/ring analog) shards the video-token axis via lkgd_tpu.parallel.sequence.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lkgd_tpu.models.configs import LoraRouter, EMPTY_ROUTER
from lkgd_tpu.models.layers import (
    DenseWithLora, LayerNorm, TimestepEmbedding, get_timestep_embedding)
from lkgd_tpu.ops.attention import dot_product_attention
from lkgd_tpu.ops.fusion import LatentKnowledgeFusion


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    num_layers: int = 42
    num_attention_heads: int = 48
    attention_head_dim: int = 64
    in_channels: int = 32  # I2V: 16 noise + 16 image-cond latents
    out_channels: int = 16
    text_embed_dim: int = 4096
    time_embed_dim: int = 512
    patch_size: int = 2
    # CogVideoX 1.5: temporal patching — pairs of latent frames become one token row
    # (reference cli_demo.py supports THUDM/CogVideoX1.5-5b*; diffusers patch_size_t).
    # None = 1.0 behavior (per-frame 2D patches).
    patch_size_t: int | None = None
    sample_frames: int = 49  # pixel frames; latent frames = (F-1)/4 + 1
    temporal_compression_ratio: int = 4
    max_text_seq_length: int = 226
    rope_base_height: int = 480
    rope_base_width: int = 720
    # CogVideoX-2b: no rotary embeddings — 3D sincos positions added to the video
    # tokens in the patch embed (diffusers use_rotary_positional_embeddings=False)
    use_rope: bool = True
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    knowledge_fusion: bool = True
    lora: LoraRouter = EMPTY_ROUTER
    # Sequence parallelism over the video-token axis — the xDiT Ulysses/ring analog
    # (`CogVideo-main/tools/parallel_inference/parallel_inference_xdit.py:14-51`).
    # "ulysses": all-to-all head exchange; "ring": ppermute K/V rotation. Requires an
    # ambient mesh with axis ``sp_axis``; video tokens (latent-frame axis upstream) must
    # divide by the axis size, and for ulysses heads must too.
    sequence_parallel: str = "none"  # none | ulysses | ring
    sp_axis: str = "context"
    # gradient checkpointing: rematerialize each transformer block in the backward
    # pass (the reference trains 5B with DeepSpeed activation checkpointing)
    remat: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def cogvideox_5b_i2v(cls, **kw) -> "CogVideoXConfig":
        return cls(**kw)

    @classmethod
    def cogvideox_2b(cls, **kw) -> "CogVideoXConfig":
        """CogVideoX-2b (T2V): 30 layers x 30 heads, sincos positions instead of RoPE
        (reference cli_demo.py supports THUDM/CogVideoX-2b)."""
        kw.setdefault("in_channels", 16)
        return cls(num_layers=30, num_attention_heads=30, attention_head_dim=64,
                   use_rope=False, **kw)

    @classmethod
    def cogvideox1_5_5b(cls, **kw) -> "CogVideoXConfig":
        """CogVideoX 1.5 5B (T2V): temporal patching, 768x1360 base, 81/161 frames
        at 16 fps (reference cli_demo.py RESOLUTION_MAP 'cogvideox1.5-5b')."""
        kw.setdefault("in_channels", 16)
        return cls(patch_size_t=2, sample_frames=81, rope_base_height=768,
                   rope_base_width=1360, **kw)

    @classmethod
    def cogvideox1_5_5b_i2v(cls, **kw) -> "CogVideoXConfig":
        return cls.cogvideox1_5_5b(in_channels=32, **kw)

    @classmethod
    def tiny(cls, **kw) -> "CogVideoXConfig":
        return cls(num_layers=2, num_attention_heads=2, attention_head_dim=16,
                   in_channels=8, out_channels=4, text_embed_dim=64, time_embed_dim=32,
                   max_text_seq_length=8, **kw)


def rope_3d(num_frames: int, height: int, width: int, head_dim: int,
            theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3D rotary embedding (diffusers get_3d_rotary_pos_embed): head_dim split into
    (t, h, w) parts sized (d/8*2, d/8*3, d/8*3). Returns (cos, sin) of shape
    (T*H*W, head_dim)."""
    dim_t = head_dim // 4
    dim_h = head_dim * 3 // 8
    dim_w = head_dim * 3 // 8

    def freqs(n, dim):
        inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        f = jnp.outer(jnp.arange(n, dtype=jnp.float32), inv)  # (n, dim/2)
        return jnp.repeat(f, 2, axis=-1)  # interleaved duplication (n, dim)

    ft = freqs(num_frames, dim_t)[:, None, None, :]
    fh = freqs(height, dim_h)[None, :, None, :]
    fw = freqs(width, dim_w)[None, None, :, :]
    ft = jnp.broadcast_to(ft, (num_frames, height, width, dim_t))
    fh = jnp.broadcast_to(fh, (num_frames, height, width, dim_h))
    fw = jnp.broadcast_to(fw, (num_frames, height, width, dim_w))
    f = jnp.concatenate([ft, fh, fw], axis=-1).reshape(-1, head_dim)
    return jnp.cos(f), jnp.sin(f)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, S, H, D); cos/sin: (S, D) with interleaved pairs."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos[None, :, None, :].astype(x.dtype) + rot * sin[None, :, None, :].astype(x.dtype)


def _sincos_1d(dim: int, pos) -> "np.ndarray":
    import numpy as np

    omega = 1.0 / (10000.0 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)))
    out = np.asarray(pos, np.float64)[:, None] * omega[None]
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_pos_embed_3d(dim: int, t: int, h: int, w: int,
                        spatial_scale: float = 1.875,
                        temporal_scale: float = 1.0) -> jnp.ndarray:
    """3D sincos positional table (t*h*w, dim) for CogVideoX-2b — diffusers
    ``get_3d_sincos_pos_embed``: 3/4 of the dim encodes the (h, w) grid (half each,
    in diffusers' meshgrid order), 1/4 encodes time; grids divided by the
    interpolation scales."""
    import numpy as np

    dim_sp, dim_t = 3 * dim // 4, dim // 4
    gw, gh = np.meshgrid(np.arange(w) / spatial_scale, np.arange(h) / spatial_scale)
    spatial = np.concatenate([_sincos_1d(dim_sp // 2, gw.reshape(-1)),
                              _sincos_1d(dim_sp // 2, gh.reshape(-1))], axis=1)
    temporal = _sincos_1d(dim_t, np.arange(t) / temporal_scale)
    pos = np.concatenate([
        np.repeat(temporal[:, None, :], h * w, axis=1),
        np.repeat(spatial[None, :, :], t, axis=0)], axis=2)
    return jnp.asarray(pos.reshape(t * h * w, dim), jnp.float32)


class CogVideoXLayerNormZero(nn.Module):
    """adaLN-zero producing separate (shift, scale, gate) for video and text streams."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder, temb):
        out = nn.Dense(6 * self.dim, dtype=self.dtype, name="linear")(nn.silu(temb))
        shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(out, 6, axis=-1)
        norm = LayerNorm(1e-5, use_scale=True, use_bias=True, dtype=self.dtype, name="norm")
        hidden = norm(hidden) * (1 + scale[:, None]) + shift[:, None]
        encoder = norm(encoder) * (1 + e_scale[:, None]) + e_shift[:, None]
        return hidden, encoder, gate[:, None], e_gate[:, None]


class CogVideoXAttention(nn.Module):
    """Joint text+video attention with per-head-dim qk layernorm and rope on video tokens
    (diffusers CogVideoXAttnProcessor2_0)."""

    config: CogVideoXConfig
    block_path: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder, rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]]):
        cfg = self.config
        inner = cfg.inner_dim
        heads, hd = cfg.num_attention_heads, cfg.attention_head_dim
        text_len = encoder.shape[1]
        x = jnp.concatenate([encoder, hidden], axis=1)
        b, s, _ = x.shape

        q = DenseWithLora(inner, adapters=cfg.lora.resolve(self.block_path, "to_q"),
                          dtype=self.dtype, name="to_q")(x)
        k = DenseWithLora(inner, adapters=cfg.lora.resolve(self.block_path, "to_k"),
                          dtype=self.dtype, name="to_k")(x)
        v = DenseWithLora(inner, adapters=cfg.lora.resolve(self.block_path, "to_v"),
                          dtype=self.dtype, name="to_v")(x)
        q = q.reshape(b, s, heads, hd)
        k = k.reshape(b, s, heads, hd)
        v = v.reshape(b, s, heads, hd)
        q = LayerNorm(1e-6, dtype=self.dtype, name="norm_q")(q)
        k = LayerNorm(1e-6, dtype=self.dtype, name="norm_k")(k)
        if rope is not None:
            # tables carry an identity rotation (cos=1, sin=0) over the text prefix, so
            # rotary applies to the WHOLE joint sequence — no per-layer slice+concat
            # copies of the (B, S, H*D) q/k tensors (~218 MB each at full size, x2
            # tensors x42 layers)
            cos, sin = rope
            if cos.shape[0] == s - text_len:  # tables without the text prefix
                pad_c = jnp.ones((text_len, cos.shape[1]), cos.dtype)
                pad_s = jnp.zeros((text_len, sin.shape[1]), sin.dtype)
                cos = jnp.concatenate([pad_c, cos], axis=0)
                sin = jnp.concatenate([pad_s, sin], axis=0)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
        if cfg.sequence_parallel != "none":
            from lkgd_tpu.parallel.sequence import joint_sp_attention

            out = joint_sp_attention(q, k, v, text_len, cfg.sequence_parallel,
                                     cfg.sp_axis).reshape(b, s, inner)
        else:
            out = dot_product_attention(q, k, v).reshape(b, s, inner)
        out = DenseWithLora(inner, adapters=cfg.lora.resolve(self.block_path, "to_out"),
                            dtype=self.dtype, name="to_out")(out)
        return out[:, text_len:], out[:, :text_len]


class CogVideoXBlock(nn.Module):
    config: CogVideoXConfig
    block_path: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder, temb, rope):
        cfg = self.config
        text_len = encoder.shape[1]
        nh, ne, gate, e_gate = CogVideoXLayerNormZero(cfg.inner_dim, dtype=self.dtype,
                                                      name="norm1")(hidden, encoder, temb)
        attn_h, attn_e = CogVideoXAttention(cfg, f"{self.block_path}.attn1",
                                            dtype=self.dtype, name="attn1")(nh, ne, rope)
        hidden = hidden + gate * attn_h
        encoder = encoder + e_gate * attn_e

        nh, ne, gate_ff, e_gate_ff = CogVideoXLayerNormZero(cfg.inner_dim, dtype=self.dtype,
                                                            name="norm2")(hidden, encoder, temb)
        x = jnp.concatenate([ne, nh], axis=1)
        h = nn.Dense(4 * cfg.inner_dim, dtype=self.dtype, name="ff_0")(x)
        h = nn.gelu(h, approximate=True)  # CogVideoX uses gelu-approximate
        h = nn.Dense(cfg.inner_dim, dtype=self.dtype, name="ff_2")(h)
        hidden = hidden + gate_ff * h[:, text_len:]
        encoder = encoder + e_gate_ff * h[:, :text_len]
        return hidden, encoder


class CogVideoXTransformer3D(nn.Module):
    config: CogVideoXConfig = CogVideoXConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, T, H, W, C) latent video
        encoder_hidden_states: jnp.ndarray,  # (B, L, 4096) T5
        timestep: jnp.ndarray,  # (B,)
        domain_features: Optional[jnp.ndarray] = None,
        flow_features: Optional[jnp.ndarray] = None,
        blocks_override=None,  # fn(hidden, encoder, emb, rope) -> (hidden, encoder):
        # replaces the in-module block loop, e.g. with parallel.pp.gpipe over a
        # 'stage' mesh (the block params must still exist in the provided variables;
        # unread subtrees are simply ignored by flax apply)
    ) -> jnp.ndarray:
        cfg = self.config
        b, t, h, w, c = hidden_states.shape
        p = cfg.patch_size
        inner = cfg.inner_dim

        # 1. time embedding
        t_emb = get_timestep_embedding(jnp.broadcast_to(jnp.atleast_1d(timestep), (b,)),
                                       inner).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)

        # 1.5 latent-knowledge fusion of the T5 context (reference :520-585)
        if cfg.knowledge_fusion:
            d = min(256, cfg.text_embed_dim // 4)  # 256 at full scale (reference :338-366)
            encoder_hidden_states = LatentKnowledgeFusion(
                ctx_dim=cfg.text_embed_dim, knowledge_dim=max(1024 * d // 256, 4 * d),
                compress_dim=d, sf_hidden=2 * d, zero_init_output=True, dtype=self.dtype,
                name="knowledge_fusion",
            )(encoder_hidden_states, domain_features, flow_features)

        # 2. patch embedding: per-frame 2D patches (1.0) or spatio-temporal
        # (pt, p, p) patches (1.5, diffusers patch_size_t) + projected text tokens
        pt = cfg.patch_size_t
        if pt is None:
            video = hidden_states.reshape(b * t, h, w, c).astype(self.dtype)
            video = nn.Conv(inner, (p, p), strides=(p, p), dtype=self.dtype,
                            name="patch_embed_proj")(video)
            video = video.reshape(b, t * (h // p) * (w // p), inner)
        else:
            if t % pt:
                raise ValueError(f"{t} latent frames not a multiple of patch_size_t={pt}"
                                 " (pad the latent clip — the pipeline does this)")
            # feature order (pt, p, p, c), token order (t/pt, h/p, w/p)
            v = hidden_states.astype(self.dtype).reshape(
                b, t // pt, pt, h // p, p, w // p, p, c)
            v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                b, (t // pt) * (h // p) * (w // p), pt * p * p * c)
            video = nn.Dense(inner, dtype=self.dtype, name="patch_embed_proj")(v)
        if cfg.sequence_parallel != "none":
            # pin the video-token axis to the SP mesh axis so every block's qkv
            # projections / FF run sequence-sharded and only attention communicates
            from jax.sharding import PartitionSpec

            video = jax.lax.with_sharding_constraint(
                video, PartitionSpec(None, cfg.sp_axis, None))
        text = nn.Dense(inner, dtype=self.dtype, name="patch_embed_text_proj")(
            encoder_hidden_states.astype(self.dtype))

        if cfg.use_rope:
            rope = rope_3d(t // (pt or 1), h // p, w // p, cfg.attention_head_dim)
        else:
            rope = None  # 2b: sincos positions added to the video tokens instead
            video = video + sincos_pos_embed_3d(
                inner, t // (pt or 1), h // p, w // p,
                cfg.spatial_interpolation_scale,
                cfg.temporal_interpolation_scale).astype(video.dtype)[None]

        hidden, encoder = video, text
        if blocks_override is not None and not self.is_initializing():
            hidden, encoder = blocks_override(hidden, encoder, emb, rope)
        else:
            block_cls = nn.remat(CogVideoXBlock) if cfg.remat else CogVideoXBlock
            for i in range(cfg.num_layers):
                hidden, encoder = block_cls(cfg, f"transformer_blocks.{i}",
                                            dtype=self.dtype,
                                            name=f"transformer_blocks_{i}")(
                                                hidden, encoder, emb, rope)

        hidden = LayerNorm(1e-5, dtype=self.dtype, name="norm_final")(
            jnp.concatenate([encoder, hidden], axis=1))[:, encoder.shape[1]:]

        # 4. final adaLN + proj
        ada = nn.Dense(2 * inner, dtype=self.dtype, name="norm_out_linear")(nn.silu(emb))
        shift, scale = jnp.split(ada, 2, axis=-1)
        hidden = LayerNorm(1e-5, use_scale=False, use_bias=False, dtype=self.dtype,
                           name="norm_out_norm")(hidden)
        hidden = hidden * (1 + scale[:, None]) + shift[:, None]
        hidden = nn.Dense((pt or 1) * p * p * cfg.out_channels, dtype=self.dtype,
                          name="proj_out")(hidden)

        # 5. unpatchify (inverse of the embed's (pt, p, p, C) feature order)
        if pt is None:
            out = hidden.reshape(b, t, h // p, w // p, p, p, cfg.out_channels)
            out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h, w, cfg.out_channels)
        else:
            out = hidden.reshape(b, t // pt, h // p, w // p, pt, p, p, cfg.out_channels)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, t, h, w,
                                                                cfg.out_channels)
        return out
