"""Spatio-temporal UNet building blocks (channels-last, static shapes).

Functional re-implementation of the diffusers block vocabulary the reference SVD UNet is
assembled from (`diffusers.models.unets.unet_3d_blocks`, consumed at reference
`models/unet_spatio_temporal_condition.py:14,171-286`), plus the LKGD joint-attention
branch that the reference bolts on by class-swizzling (`patch/patch.py:94-688`) — here a
static config option of the transformer blocks.

Layout conventions:
  * hidden states: ``(B*T, H, W, C)`` channels-last (B stream-major when joint streams)
  * temb: ``(B*T, 1280)``; image_only_indicator: ``(B, T)``
  * spatial attention tokens: ``(B*T, H*W, C)``; temporal tokens: ``(B*H*W, T, C)``
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, EMPTY_ROUTER
from lkgd_tpu.models.layers import (
    AdaLayerNormContinuous,
    AlphaBlender,
    Attention,
    FeedForward,
    FrameAxisAttention,
    GroupNorm,
    LayerNorm,
    TimestepEmbedding,
    get_timestep_embedding,
)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample via repeat (jax.image.resize lowers to gathers on TPU)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)


def upsample2x_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                       dtype) -> jnp.ndarray:
    """conv3x3(nearest_upsample_2x(x), pad=1) computed WITHOUT materializing the 4x
    upsampled tensor — exact subpixel fold.

    On the 2x-nearest grid, each output-parity class (r, c) of the 3x3 window only ever
    reads original pixels at two row offsets and two col offsets (duplicated taps sum):
    row parity 0 sees offsets (-1, 0) with kernels (W0, W1+W2); parity 1 sees (0, +1)
    with (W0+W1, W2); columns likewise. So the op is FOUR (2,2) convs on the ORIGINAL
    resolution with per-parity asymmetric zero padding, interleaved — 16 taps of work
    at 1x reads instead of 36 taps at 4x reads (2.25x fewer FLOPs, 4x less conv input
    traffic). Kernel algebra runs in fp32 and constant-folds at compile time, so bf16
    numerics match the unfolded op to rounding. Exactness is oracle-covered (the UNet /
    temporal-VAE composed torch parity tests run through this path)."""
    w = kernel.astype(jnp.float32)
    r0 = jnp.stack([w[0], w[1] + w[2]])  # (2, 3, Ci, Co), row offsets (-1, 0)
    r1 = jnp.stack([w[0] + w[1], w[2]])  # row offsets (0, +1)

    def colsplit(k):
        c0 = jnp.stack([k[:, 0], k[:, 1] + k[:, 2]], axis=1)  # col offsets (-1, 0)
        c1 = jnp.stack([k[:, 0] + k[:, 1], k[:, 2]], axis=1)  # col offsets (0, +1)
        return c0, c1

    k00, k01 = colsplit(r0)
    k10, k11 = colsplit(r1)
    pads = {(0, 0): ((1, 0), (1, 0)), (0, 1): ((1, 0), (0, 1)),
            (1, 0): ((0, 1), (1, 0)), (1, 1): ((0, 1), (0, 1))}

    def conv(k, pad):
        return jax.lax.conv_general_dilated(
            x, k.astype(dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y00 = conv(k00, pads[(0, 0)])
    y01 = conv(k01, pads[(0, 1)])
    y10 = conv(k10, pads[(1, 0)])
    y11 = conv(k11, pads[(1, 1)])
    b_, hh, ww, co = y00.shape
    y = jnp.stack([jnp.stack([y00, y01], axis=3), jnp.stack([y10, y11], axis=3)],
                  axis=2)  # (B, H, 2, W, 2, Co)
    return y.reshape(b_, 2 * hh, 2 * ww, co) + bias.astype(dtype)


class FoldedUpsampleConv(nn.Module):
    """Parameter-compatible replacement for ``nearest_upsample_2x + nn.Conv(3x3)``:
    same param tree (kernel (3,3,Ci,Co) HWIO + bias), folded compute."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return upsample2x_conv3x3(x, kernel, bias, self.dtype)


# ------------------------------------------------------------------ resnet blocks
class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (pre-norm, silu, 3x3 convs, temb add after conv1)."""

    out_channels: int
    temb_channels: int = 1280
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = GroupNorm(32, self.eps, dtype=self.dtype, act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm(32, self.eps, dtype=self.dtype, act="silu", name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """diffusers TemporalResnetBlock: (3,1,1) convs over the frame axis.

    Input ``(B, T, H*W, C)``; the (3,1,1) Conv3d becomes a (3,1) Conv over (T, HW) —
    identical math, TPU-friendly layout. temb: ``(B, T, temb_channels)``.
    """

    out_channels: int
    temb_channels: int = 1280
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = GroupNorm(32, self.eps, dtype=self.dtype, act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, :, None, :]
        h = GroupNorm(32, self.eps, dtype=self.dtype, act="silu", name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                    name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial ResBlock + temporal ResBlock + learned AlphaBlender
    (diffusers SpatioTemporalResBlock; see SURVEY.md §2.1)."""

    out_channels: int
    temb_channels: int = 1280
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray,
                 image_only_indicator: jnp.ndarray) -> jnp.ndarray:
        num_frames = image_only_indicator.shape[-1]
        h = ResnetBlock2D(self.out_channels, self.temb_channels, self.eps, dtype=self.dtype,
                          name="spatial_res_block")(x, temb)
        bf, H, W, C = h.shape
        b = bf // num_frames
        h_t = h.reshape(b, num_frames, H * W, C)
        temb_t = temb.reshape(b, num_frames, temb.shape[-1])
        mix = TemporalResnetBlock(self.out_channels, self.temb_channels, self.eps,
                                  dtype=self.dtype, name="temporal_res_block")(h_t, temb_t)
        out = AlphaBlender(0.5, switch_spatial_to_temporal_mix=True, name="time_mixer")(
            h_t, mix, image_only_indicator)
        return out.reshape(bf, H, W, C)


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                       name="conv")(x)


class Upsample2D(nn.Module):
    # NOTE: the FoldedUpsampleConv form (exact 4x(2,2)-conv fold, 2.25x fewer FLOPs)
    # measured SLOWER end-to-end (VAE decode 0.851 -> 0.939 s: it fragments XLA's conv
    # mega-fusions) — measured rejection in BASELINE.md round 4; keep nearest+conv.
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nearest_upsample_2x(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


# ------------------------------------------------------------------ joint-attention helpers
def _partner_streams(x: jnp.ndarray, joint: JointAttentionConfig, num_frames: int,
                     flip_frames: bool) -> jnp.ndarray:
    """Build the partner-stream context: swap stream blocks per the static mask, optionally
    reversing the frame axis (reference `patch/patch.py:454-475`). ``x``: (rows, N, C) with
    rows stream-major; the frame axis is nested innermost of the row-block when
    ``flip_frames`` (spatial layout rows = B*T)."""
    s = len(joint.mask)
    rows, n, c = x.shape
    perm_t = joint.partner_perm
    # Alternating masks (every reference config: (0,1)*k) pair ADJACENT streams, and the
    # swap is then a reshape + reverse of a size-2 axis instead of a jnp.take gather.
    # Same values, radically different SPMD lowering: under the v5e-8 row-sharded mesh a
    # static-index take over the sharded stream axis all-gathers the FULL activation per
    # joint block (measured: 379 all-gathers x ~785 MiB = 297 GiB/step on the smooth
    # graph), while the pair-local reverse is collective-free because partner rows live
    # on the same chip (audited A/B in BASELINE.md session 14). Single-chip: both are
    # one copy.
    pair_swap = all(p == i ^ 1 for i, p in enumerate(perm_t))
    if flip_frames and joint.flip:
        if pair_swap:
            xr = x.reshape(s // 2, 2, rows // s // num_frames, num_frames, n, c)
            xr = xr[:, ::-1, :, ::-1]
        else:
            xr = x.reshape(s, rows // s // num_frames, num_frames, n, c)
            xr = jnp.take(xr, jnp.asarray(perm_t, jnp.int32), axis=0)[:, :, ::-1]
    else:
        if pair_swap:
            xr = x.reshape(s // 2, 2, rows // s, n, c)[:, ::-1]
        else:
            xr = x.reshape(s, rows // s, n, c)
            xr = jnp.take(xr, jnp.asarray(perm_t, jnp.int32), axis=0)
    return xr.reshape(rows, n, c)


class JointAttentionBranch(nn.Module):
    """attn1n + zero-init post projection (reference `patch/patch.py:143-172,438-500`).

    ``temporal=True`` runs the branch inside a temporal transformer block: tokens stay in
    the spatial-major ``(B*T, HW, C)`` layout and attn1n contracts the frame axis
    (see :class:`~lkgd_tpu.models.layers.FrameAxisAttention`)."""

    dim: int
    heads: int
    dim_head: int
    joint: JointAttentionConfig
    block_path: str  # diffusers-style path prefix for LoRA routing
    lora: LoraRouter = EMPTY_ROUTER
    temporal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, norm_hidden_states: jnp.ndarray, num_frames: int,
                 flip_frames: bool, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = norm_hidden_states
        if self.joint.add_norm:
            if temb is None:
                raise ValueError("add_norm joint attention requires temb conditioning")
            x = AdaLayerNormContinuous(self.dim, dtype=self.dtype, name="norm1n")(x, temb)

        partner = _partner_streams(x, self.joint, num_frames, flip_frames)
        p = f"{self.block_path}.attn1n"
        adapters = dict(
            adapters_q=self.lora.resolve(p, "to_q"),
            # K/V projections act on the partner stream -> inverted masks
            # (reference patch.py:892-895)
            adapters_k=self.lora.resolve(p, "to_k", invert_streams=True),
            adapters_v=self.lora.resolve(p, "to_v", invert_streams=True),
            adapters_out=self.lora.resolve(p, "to_out"),
        )
        if self.temporal:
            out = FrameAxisAttention(self.dim, self.heads, self.dim_head, dtype=self.dtype,
                                     name="attn1n", **adapters)(
                x, num_frames, encoder_hidden_states=partner)
        else:
            out = Attention(self.dim, self.heads, self.dim_head, dtype=self.dtype,
                            name="attn1n", **adapters)(x, encoder_hidden_states=partner)

        if self.joint.post == "conv":
            out = nn.Dense(self.dim, use_bias=False, kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name="conv1n")(out)
        elif self.joint.post == "scale":
            scale = self.param("scale1n", nn.initializers.zeros, (1, 1, self.dim))
            out = out * scale.astype(out.dtype)
        elif self.joint.post == "conv_fuse":
            # concat x-rows with y-rows featurewise, mix with one zero-init linear, scatter
            # back (reference patch.py:488-494)
            s = len(self.joint.mask)
            rows, n, c = out.shape
            blocks = out.reshape(s, rows // s, n, c)
            ones = [i for i, m in enumerate(self.joint.mask) if m]
            zeros = [i for i, m in enumerate(self.joint.mask) if not m]
            x_part = blocks[jnp.asarray(ones)].reshape(-1, n, c)
            y_part = blocks[jnp.asarray(zeros)].reshape(-1, n, c)
            fused = nn.Dense(2 * self.dim, use_bias=False, kernel_init=nn.initializers.zeros,
                             dtype=self.dtype, name="conv1n")(
                                 jnp.concatenate([x_part, y_part], axis=-1))
            fx, fy = jnp.split(fused, 2, axis=-1)
            blocks = blocks.at[jnp.asarray(ones)].set(fx.reshape(len(ones), rows // s, n, c))
            blocks = blocks.at[jnp.asarray(zeros)].set(fy.reshape(len(zeros), rows // s, n, c))
            out = blocks.reshape(rows, n, c)
        return out


# ------------------------------------------------------------------ transformer blocks
class BasicTransformerBlock(nn.Module):
    """Spatial transformer block: self-attn (+ optional joint branch), cross-attn, GEGLU FF
    (diffusers BasicTransformerBlock; joint branch per reference `patch/patch.py:390-580`)."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int = 1024
    joint: Optional[JointAttentionConfig] = None
    block_path: str = ""
    lora: LoraRouter = EMPTY_ROUTER
    track_fusion: bool = False  # patch_FSM joint-frame track fusion (patch_FSM.py:386-443)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, encoder_hidden_states: jnp.ndarray,
                 num_frames: int = 1, joint_scale=1.0,
                 temb: Optional[jnp.ndarray] = None, tracks=None,
                 spatial_hw: Optional[tuple] = None) -> jnp.ndarray:
        norm_x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        attn_out = Attention(
            self.dim, self.heads, self.dim_head, dtype=self.dtype, name="attn1",
            adapters_q=self.lora.resolve(f"{self.block_path}.attn1", "to_q"),
            adapters_k=self.lora.resolve(f"{self.block_path}.attn1", "to_k"),
            adapters_v=self.lora.resolve(f"{self.block_path}.attn1", "to_v"),
            adapters_out=self.lora.resolve(f"{self.block_path}.attn1", "to_out"),
        )(norm_x)
        if self.joint is not None and self.joint.spatial:
            joint_out = JointAttentionBranch(
                self.dim, self.heads, self.dim_head, self.joint, self.block_path, self.lora,
                dtype=self.dtype, name="joint")(norm_x, num_frames, flip_frames=True, temb=temb)
            attn_out = attn_out + joint_out * joint_scale
        x = x + attn_out

        if self.track_fusion and tracks is not None:
            # paired-frame track fusion after self-attention (patch_FSM.py:386-443):
            # dst features route onto src coordinates through the tracks, fuse through
            # a zero-init 3x3 conv, and both streams get residual adds
            from lkgd_tpu.ops.track_fusion import track_scatter_fusion

            h, w = spatial_hw
            src_idx, dst_idx, visibility = tracks
            conv = nn.Conv(2 * self.dim, (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros, name="conv_fuse")
            x = track_scatter_fusion(x, src_idx, dst_idx, visibility, conv, h, w)

        norm_x = LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            self.dim, self.heads, self.dim_head, kv_dim=self.cross_attention_dim,
            dtype=self.dtype, name="attn2",
            adapters_q=self.lora.resolve(f"{self.block_path}.attn2", "to_q"),
            adapters_k=self.lora.resolve(f"{self.block_path}.attn2", "to_k"),
            adapters_v=self.lora.resolve(f"{self.block_path}.attn2", "to_v"),
            adapters_out=self.lora.resolve(f"{self.block_path}.attn2", "to_out"),
        )(norm_x, encoder_hidden_states=encoder_hidden_states)

        norm_x = LayerNorm(dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(dtype=self.dtype, name="ff")(norm_x)


class TemporalBasicTransformerBlock(nn.Module):
    """Temporal transformer block: ff_in + temporal self-attn (+ optional joint branch) +
    cross-attn + FF (diffusers TemporalBasicTransformerBlock; joint per
    reference `patch/patch.py:582-686`).

    Input ``(B*T, HW, C)`` — and it *stays* in that spatial-major layout: LayerNorms,
    feed-forwards and q/k/v projections are position-independent, and the frame axis is
    contracted only inside :class:`~lkgd_tpu.models.layers.FrameAxisAttention`. The
    reference transposes to (B*HW, T, C) tokens instead; on TPU that logical transpose
    propagates a strided layout into every op of the block (measured: LayerNorms at
    ~20 GB/s, matmuls emitted as 10 TF/s convolutions — see BASELINE.md).

    ``time_context``: per-sample (B, L, cross_attention_dim) conditioning (the reference
    broadcasts it per pixel; here K/V run once per sample)."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int = 1024
    joint: Optional[JointAttentionConfig] = None
    block_path: str = ""
    lora: LoraRouter = EMPTY_ROUTER
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, time_context: jnp.ndarray,
                 joint_scale=1.0) -> jnp.ndarray:
        residual = x
        h = LayerNorm(dtype=self.dtype, name="norm_in")(x)
        h = FeedForward(dtype=self.dtype, name="ff_in")(h)
        x = h + residual  # is_res: time_mix_inner_dim == dim in SVD

        norm_x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        attn_out = FrameAxisAttention(
            self.dim, self.heads, self.dim_head, dtype=self.dtype, name="attn1",
            adapters_q=self.lora.resolve(f"{self.block_path}.attn1", "to_q"),
            adapters_k=self.lora.resolve(f"{self.block_path}.attn1", "to_k"),
            adapters_v=self.lora.resolve(f"{self.block_path}.attn1", "to_v"),
            adapters_out=self.lora.resolve(f"{self.block_path}.attn1", "to_out"),
        )(norm_x, num_frames)
        if self.joint is not None and self.joint.temporal:
            # NOTE: the reference's temporal forward adds the joint branch UNSCALED —
            # joint_scale is only applied in the spatial path (patch/patch.py:657-660 vs
            # :500). joint_scale IS user-settable (gradio_mask_depth_joint.py:310 slider
            # passes 0-2 through set_joint_scale) but only the spatial path consumes it;
            # the temporal forward ignores it, and we match that graph exactly.
            joint_out = JointAttentionBranch(
                self.dim, self.heads, self.dim_head, self.joint, self.block_path, self.lora,
                temporal=True, dtype=self.dtype, name="joint")(
                    norm_x, num_frames, flip_frames=False)
            attn_out = attn_out + joint_out
        x = x + attn_out

        norm_x = LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + FrameAxisAttention(
            self.dim, self.heads, self.dim_head, kv_dim=self.cross_attention_dim,
            dtype=self.dtype, name="attn2")(norm_x, num_frames,
                                            encoder_hidden_states=time_context,
                                            per_sample_ctx=True)

        norm_x = LayerNorm(dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(dtype=self.dtype, name="ff")(norm_x)


class TransformerSpatioTemporalModel(nn.Module):
    """GroupNorm + proj_in + interleaved spatial/temporal blocks + AlphaBlender + proj_out
    (diffusers TransformerSpatioTemporalModel)."""

    num_layers: int
    heads: int
    dim_head: int
    cross_attention_dim: int = 1024
    joint: Optional[JointAttentionConfig] = None
    block_path: str = ""
    lora: LoraRouter = EMPTY_ROUTER
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, encoder_hidden_states: jnp.ndarray,
                 image_only_indicator: jnp.ndarray, joint_scale=1.0,
                 temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        bf, H, W, C = x.shape
        num_frames = image_only_indicator.shape[-1]
        b = bf // num_frames
        inner = self.heads * self.dim_head

        # time_context: first-frame context per sample (diffusers broadcasts it per
        # pixel; FrameAxisAttention consumes it per-sample instead)
        ctx = encoder_hidden_states  # (B*T, L, D)
        time_context = ctx.reshape(b, num_frames, *ctx.shape[1:])[:, 0]  # (B, L, D)

        residual = x
        h = GroupNorm(32, 1e-6, dtype=self.dtype, name="norm")(x)
        h = h.reshape(bf, H * W, C)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)

        # frame-position embedding added before each temporal block
        frame_ids = jnp.tile(jnp.arange(num_frames, dtype=jnp.float32), b)
        t_emb = get_timestep_embedding(frame_ids, inner)
        emb = TimestepEmbedding(inner * 4, out_dim=inner, dtype=self.dtype, name="time_pos_embed")(
            t_emb.astype(self.dtype))
        emb = emb[:, None, :]

        time_mixer = AlphaBlender(0.5, name="time_mixer")  # one blender shared by all layers
        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.cross_attention_dim,
                joint=self.joint, block_path=f"{self.block_path}.transformer_blocks.{i}", lora=self.lora,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(h, encoder_hidden_states, num_frames=num_frames, joint_scale=joint_scale, temb=temb)
            h_mix = h + emb
            h_mix = TemporalBasicTransformerBlock(
                inner, self.heads, self.dim_head, self.cross_attention_dim,
                joint=self.joint, block_path=f"{self.block_path}.temporal_transformer_blocks.{i}",
                lora=self.lora, dtype=self.dtype, name=f"temporal_transformer_blocks_{i}",
            )(h_mix, num_frames, time_context, joint_scale=joint_scale)
            h = time_mixer(h, h_mix, image_only_indicator)

        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(bf, H, W, C) + residual


# ------------------------------------------------------------------ down / mid / up blocks
class CrossAttnDownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 2
    eps: float = 1e-5
    transformer_layers: int = 1
    heads: int = 5
    cross_attention_dim: int = 1024
    add_downsample: bool = True
    joint: Optional[JointAttentionConfig] = None
    block_path: str = ""
    lora: LoraRouter = EMPTY_ROUTER
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states, image_only_indicator, joint_scale=1.0):
        outputs = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(self.out_channels, eps=self.eps, dtype=self.dtype,
                                       name=f"resnets_{i}")(x, temb, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.transformer_layers, self.heads, self.out_channels // self.heads,
                self.cross_attention_dim, joint=self.joint,
                block_path=f"{self.block_path}.attentions.{i}", lora=self.lora, dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, encoder_hidden_states, image_only_indicator, joint_scale=joint_scale, temb=temb)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            outputs.append(x)
        return x, tuple(outputs)


class DownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 2
    eps: float = 1e-5
    add_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, image_only_indicator):
        outputs = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(self.out_channels, eps=self.eps, dtype=self.dtype,
                                       name=f"resnets_{i}")(x, temb, image_only_indicator)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            outputs.append(x)
        return x, tuple(outputs)


class UNetMidBlockSpatioTemporal(nn.Module):
    channels: int
    transformer_layers: int = 1
    eps: float = 1e-5
    heads: int = 20
    cross_attention_dim: int = 1024
    joint: Optional[JointAttentionConfig] = None
    block_path: str = "mid_block"
    lora: LoraRouter = EMPTY_ROUTER
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states, image_only_indicator, joint_scale=1.0):
        x = SpatioTemporalResBlock(self.channels, eps=self.eps, dtype=self.dtype, name="resnets_0")(
            x, temb, image_only_indicator)
        x = TransformerSpatioTemporalModel(
            self.transformer_layers, self.heads, self.channels // self.heads,
            self.cross_attention_dim, joint=self.joint, block_path=f"{self.block_path}.attentions.0",
            lora=self.lora, dtype=self.dtype, name="attentions_0",
        )(x, encoder_hidden_states, image_only_indicator, joint_scale=joint_scale, temb=temb)
        x = SpatioTemporalResBlock(self.channels, eps=self.eps, dtype=self.dtype, name="resnets_1")(
            x, temb, image_only_indicator)
        return x


class UpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 3
    eps: float = 1e-5
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb, image_only_indicator):
        for i in range(self.num_layers):
            res = res_samples[-1]
            res_samples = res_samples[:-1]
            x = jnp.concatenate([x, res], axis=-1)
            x = SpatioTemporalResBlock(self.out_channels, eps=self.eps, dtype=self.dtype,
                                       name=f"resnets_{i}")(x, temb, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 3
    eps: float = 1e-5
    transformer_layers: int = 1
    heads: int = 20
    cross_attention_dim: int = 1024
    add_upsample: bool = True
    joint: Optional[JointAttentionConfig] = None
    block_path: str = ""
    lora: LoraRouter = EMPTY_ROUTER
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb, encoder_hidden_states, image_only_indicator,
                 joint_scale=1.0):
        for i in range(self.num_layers):
            res = res_samples[-1]
            res_samples = res_samples[:-1]
            x = jnp.concatenate([x, res], axis=-1)
            x = SpatioTemporalResBlock(self.out_channels, eps=self.eps, dtype=self.dtype,
                                       name=f"resnets_{i}")(x, temb, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.transformer_layers, self.heads, self.out_channels // self.heads,
                self.cross_attention_dim, joint=self.joint,
                block_path=f"{self.block_path}.attentions.{i}", lora=self.lora, dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, encoder_hidden_states, image_only_indicator, joint_scale=joint_scale, temb=temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x
