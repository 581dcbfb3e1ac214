"""UNet2DCondition — the SD 2D denoiser family, TPU-native.

Covers the reference's 2D model variants (`/root/reference/models/`):
  * standard SD2 UNet (used by the inpaint/joint pipelines; unet_2d_condition_mask.py)
  * extra image-space conditioning encoder added at conv_in
    (unet_2d_condition_cond.py:70-118) — ``config.cond_embedding_channels``
  * joint x<->y stream attention + stream-masked LoRA (the patch/patch.py machinery,
    shared with the SVD UNet via models.blocks_svd.BasicTransformerBlock)
  * ControlNet residual injection (models/controlnet.py consumer side)

Layout: (B, H, W, C) channels-last; timesteps may be per-sample (B,) — the 2D joint
pipelines use different timesteps per stream (pipeline_..._joint_control.py:995-1000).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lkgd_tpu.models.blocks_svd import Downsample2D, ResnetBlock2D, Upsample2D
from lkgd_tpu.models.blocks_svd import BasicTransformerBlock
from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, EMPTY_ROUTER
from lkgd_tpu.models.layers import GroupNorm, TimestepEmbedding, get_timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 4  # 9 for inpaint (latents + mask + masked latents)
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "DownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D")
    layers_per_block: int = 2
    transformer_layers_per_block: int = 1
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024  # SD2 OpenCLIP text width
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True
    # image-space conditioning encoder added at conv_in (unet_2d_condition_cond.py)
    cond_embedding_channels: Optional[int] = None
    cond_embedding_blocks: Tuple[int, ...] = (16, 32, 96, 256)
    joint: Optional[JointAttentionConfig] = None
    lora: LoraRouter = EMPTY_ROUTER
    # patch_FSM joint-frame track fusion in the spatial blocks (patch_FSM.py:386-443);
    # forward then takes tracks=(src_xy, dst_xy, visibility) — IMAGE-pixel coords when
    # forward's track_image_size gives the pixel resolution (the reference contract:
    # downsample = image_size / feat_size, patch_FSM.py:427-431), else coords on the
    # latent sample grid
    track_fusion: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


class Transformer2DModel(nn.Module):
    """GroupNorm + linear proj + N BasicTransformerBlocks + linear proj (SD2 style)."""

    num_layers: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    joint: Optional[JointAttentionConfig] = None
    block_path: str = ""
    lora: LoraRouter = EMPTY_ROUTER
    track_fusion: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states, joint_scale=1.0, temb=None,
                 tracks=None, track_res=None):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        blk_tracks = None
        if self.track_fusion and tracks is not None:
            # quantize pixel tracks onto this level's feature grid (reference
            # patch_FSM.py:427-431 downsample derivation)
            from lkgd_tpu.ops.track_fusion import quantize_tracks

            src_xy, dst_xy, vis = tracks
            src_idx, dst_idx = quantize_tracks(src_xy, dst_xy, h, w, track_res[0] / h)
            blk_tracks = (src_idx, dst_idx, vis)
        z = GroupNorm(32, 1e-6, dtype=self.dtype, name="norm")(x).reshape(b, h * w, c)
        z = nn.Dense(inner, dtype=self.dtype, name="proj_in")(z)
        for i in range(self.num_layers):
            z = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.cross_attention_dim,
                joint=self.joint, block_path=f"{self.block_path}.transformer_blocks.{i}",
                lora=self.lora, track_fusion=self.track_fusion,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(z, encoder_hidden_states, num_frames=1, joint_scale=joint_scale, temb=temb,
              tracks=blk_tracks, spatial_hw=(h, w))
        z = nn.Dense(c, dtype=self.dtype, name="proj_out")(z)
        return z.reshape(b, h, w, c) + residual


class ConditioningEmbedding(nn.Module):
    """Image-space condition encoder added at conv_in (unet_2d_condition_cond.py:70-118)."""

    embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conditioning: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(conditioning.astype(self.dtype))
        x = nn.silu(x)
        for i in range(len(self.block_out_channels) - 1):
            x = nn.Conv(self.block_out_channels[i], (3, 3), padding=1, dtype=self.dtype,
                        name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(self.block_out_channels[i + 1], (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        return nn.Conv(self.embedding_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros, dtype=self.dtype, name="conv_out")(x)


class UNet2DCondition(nn.Module):
    config: UNet2DConfig = UNet2DConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C)
        timesteps: jnp.ndarray,  # scalar or (B,)
        encoder_hidden_states: jnp.ndarray,  # (B, L, D)
        cond_image: Optional[jnp.ndarray] = None,  # image-space extra conditioning
        down_block_additional_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        joint_scale=1.0,
        tracks=None,  # (src_xy, dst_xy, visibility) point tracks (see config note)
        track_image_size=None,  # (H_px, W_px) pixel resolution the track coords use;
                                # None = coords already on the latent sample grid
    ) -> jnp.ndarray:
        cfg = self.config
        b = sample.shape[0]
        track_res = track_image_size or sample.shape[1:3]

        t_emb = get_timestep_embedding(
            jnp.broadcast_to(jnp.atleast_1d(timesteps), (b,)), cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos, downscale_freq_shift=cfg.freq_shift,
        ).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)

        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                         name="conv_in")(sample.astype(self.dtype))
        if cfg.cond_embedding_channels is not None and cond_image is not None:
            sample = sample + ConditioningEmbedding(
                cfg.block_out_channels[0], cfg.cond_embedding_blocks, dtype=self.dtype,
                name="cond_embedding")(cond_image)

        ehs = encoder_hidden_states.astype(self.dtype)

        res_samples = (sample,)
        for i, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            heads = cfg.num_attention_heads[i]
            for j in range(cfg.layers_per_block):
                sample = ResnetBlock2D(ch, dtype=self.dtype,
                                       name=f"down_blocks_{i}_resnets_{j}")(sample, emb)
                if block_type == "CrossAttnDownBlock2D":
                    sample = Transformer2DModel(
                        cfg.transformer_layers_per_block, heads, ch // heads,
                        cfg.cross_attention_dim, joint=cfg.joint,
                        block_path=f"down_blocks.{i}.attentions.{j}", lora=cfg.lora,
                        track_fusion=cfg.track_fusion,
                        dtype=self.dtype, name=f"down_blocks_{i}_attentions_{j}",
                    )(sample, ehs, joint_scale, emb, tracks, track_res)
                res_samples = res_samples + (sample,)
            if i < len(cfg.block_out_channels) - 1:
                sample = Downsample2D(ch, dtype=self.dtype,
                                      name=f"down_blocks_{i}_downsamplers_0")(sample)
                res_samples = res_samples + (sample,)

        if down_block_additional_residuals is not None:
            res_samples = tuple(
                r + a.reshape(r.shape).astype(r.dtype)
                for r, a in zip(res_samples, down_block_additional_residuals))

        ch = cfg.block_out_channels[-1]
        sample = ResnetBlock2D(ch, dtype=self.dtype, name="mid_block_resnets_0")(sample, emb)
        sample = Transformer2DModel(
            cfg.transformer_layers_per_block, cfg.num_attention_heads[-1],
            ch // cfg.num_attention_heads[-1], cfg.cross_attention_dim, joint=cfg.joint,
            block_path="mid_block.attentions.0", lora=cfg.lora,
            track_fusion=cfg.track_fusion, dtype=self.dtype,
            name="mid_block_attentions_0")(sample, ehs, joint_scale, emb, tracks, track_res)
        sample = ResnetBlock2D(ch, dtype=self.dtype, name="mid_block_resnets_1")(sample, emb)
        if mid_block_additional_residual is not None:
            sample = sample + mid_block_additional_residual.reshape(sample.shape).astype(sample.dtype)

        reversed_channels = tuple(reversed(cfg.block_out_channels))
        reversed_heads = tuple(reversed(cfg.num_attention_heads))
        for i, block_type in enumerate(cfg.up_block_types):
            ch = reversed_channels[i]
            heads = reversed_heads[i]
            for j in range(cfg.layers_per_block + 1):
                res = res_samples[-1]
                res_samples = res_samples[:-1]
                sample = jnp.concatenate([sample, res], axis=-1)
                sample = ResnetBlock2D(ch, dtype=self.dtype,
                                       name=f"up_blocks_{i}_resnets_{j}")(sample, emb)
                if block_type == "CrossAttnUpBlock2D":
                    sample = Transformer2DModel(
                        cfg.transformer_layers_per_block, heads, ch // heads,
                        cfg.cross_attention_dim, joint=cfg.joint,
                        block_path=f"up_blocks.{i}.attentions.{j}", lora=cfg.lora,
                        track_fusion=cfg.track_fusion,
                        dtype=self.dtype, name=f"up_blocks_{i}_attentions_{j}",
                    )(sample, ehs, joint_scale, emb, tracks, track_res)
            if i < len(cfg.block_out_channels) - 1:
                sample = Upsample2D(ch, dtype=self.dtype,
                                    name=f"up_blocks_{i}_upsamplers_0")(sample)

        sample = GroupNorm(32, 1e-5, dtype=self.dtype, act="silu", name="conv_norm_out")(sample)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(sample)
