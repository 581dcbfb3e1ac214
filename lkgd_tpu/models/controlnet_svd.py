"""ControlNet-SDV — spatio-temporal ControlNet for the SVD UNet, TPU-native.

Re-implements `/root/reference/models/controlnet_sdv.py:64-638`: an image-space
conditioning embedder (4 stride-2 convs, zero-init output), a copy of the SVD UNet's
encoder + mid, and zero-init 1x1 "controlnet blocks" emitting per-level residuals that the
host UNet adds to its skip connections (`unet_svd.py` ``down_block_additional_residuals`` /
``mid_block_additional_residual``; reference injection at unet :640-658).

``init_from_unet`` mirrors the reference's ``from_unet`` weight-copy constructor (:582-638).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lkgd_tpu.models.blocks_svd import (
    CrossAttnDownBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
)
from lkgd_tpu.models.configs import SVDUNetConfig
from lkgd_tpu.models.layers import TimestepEmbedding, get_timestep_embedding


@dataclasses.dataclass(frozen=True)
class ControlNetSDVConfig:
    unet: SVDUNetConfig = SVDUNetConfig()
    conditioning_channels: int = 3
    conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256)


class ControlNetConditioningEmbeddingSVD(nn.Module):
    """Image-space condition encoder (reference :64-119): conv_in + 3x(conv, stride-2 conv)
    with SiLU, zero-init conv_out. Input (B, T, H, W, C_cond) -> (B*T, h, w, emb_ch)."""

    embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conditioning: jnp.ndarray) -> jnp.ndarray:
        b, t = conditioning.shape[:2]
        x = conditioning.reshape((b * t,) + conditioning.shape[2:]).astype(self.dtype)
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
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


class ControlNetSDV(nn.Module):
    config: ControlNetSDVConfig = ControlNetSDVConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, T, h, w, C_in) — same input the UNet sees
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        added_time_ids: jnp.ndarray,
        controlnet_cond: Optional[jnp.ndarray] = None,  # (B, T, H, W, C_cond) image space
        conditioning_scale: float = 1.0,
    ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        cfg = self.config.unet
        batch_size, num_frames = sample.shape[0], sample.shape[1]

        t_emb = get_timestep_embedding(jnp.broadcast_to(jnp.atleast_1d(timesteps), (batch_size,)),
                                       cfg.block_out_channels[0]).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)
        add_embeds = get_timestep_embedding(added_time_ids.reshape(-1),
                                            cfg.addition_time_embed_dim)
        add_embeds = add_embeds.reshape(batch_size, -1).astype(self.dtype)
        emb = emb + TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                      name="add_embedding")(add_embeds)

        sample = sample.reshape((batch_size * num_frames,) + sample.shape[2:]).astype(self.dtype)
        emb = jnp.repeat(emb, num_frames, axis=0)
        encoder_hidden_states = jnp.repeat(encoder_hidden_states.astype(self.dtype),
                                           num_frames, axis=0)

        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                         name="conv_in")(sample)
        if controlnet_cond is not None:
            cond_emb = ControlNetConditioningEmbeddingSVD(
                cfg.block_out_channels[0], self.config.conditioning_embedding_out_channels,
                dtype=self.dtype, name="controlnet_cond_embedding")(controlnet_cond)
            sample = sample + cond_emb

        image_only_indicator = jnp.zeros((batch_size, num_frames), dtype=self.dtype)

        res_samples = (sample,)
        for i, block_type in enumerate(cfg.down_block_types):
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                sample, outs = CrossAttnDownBlockSpatioTemporal(
                    cfg.block_out_channels[i], num_layers=cfg.layers_per_block,
                    transformer_layers=cfg.transformer_layers_per_block,
                    heads=cfg.num_attention_heads[i], cross_attention_dim=cfg.cross_attention_dim,
                    add_downsample=i < len(cfg.block_out_channels) - 1,
                    block_path=f"down_blocks.{i}", dtype=self.dtype, name=f"down_blocks_{i}",
                )(sample, emb, encoder_hidden_states, image_only_indicator)
            else:
                sample, outs = DownBlockSpatioTemporal(
                    cfg.block_out_channels[i], num_layers=cfg.layers_per_block,
                    add_downsample=i < len(cfg.block_out_channels) - 1, dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(sample, emb, image_only_indicator)
            res_samples = res_samples + outs

        sample = UNetMidBlockSpatioTemporal(
            cfg.block_out_channels[-1], transformer_layers=cfg.transformer_layers_per_block,
            heads=cfg.num_attention_heads[-1], cross_attention_dim=cfg.cross_attention_dim,
            dtype=self.dtype, name="mid_block",
        )(sample, emb, encoder_hidden_states, image_only_indicator)

        # zero-init 1x1 controlnet heads per residual level + mid (reference :406-439)
        down_residuals = []
        for i, res in enumerate(res_samples):
            r = nn.Conv(res.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name=f"controlnet_down_blocks_{i}")(res)
            down_residuals.append(r * conditioning_scale)
        mid_residual = nn.Conv(sample.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                               dtype=self.dtype, name="controlnet_mid_block")(sample)
        return tuple(down_residuals), mid_residual * conditioning_scale


def init_from_unet(controlnet: ControlNetSDV, controlnet_params, unet_params):
    """Copy the encoder/mid/embedding weights of a trained UNet into a fresh ControlNet
    (reference ``from_unet``, controlnet_sdv.py:582-638). Zero heads stay zero."""
    cn = jax.tree_util.tree_map(lambda x: x, controlnet_params)  # shallow copy
    up, cp = unet_params["params"], cn["params"]
    for key in list(cp.keys()):
        if key.startswith(("down_blocks", "mid_block", "time_embedding", "add_embedding",
                           "conv_in")):
            if key in up:
                cp[key] = up[key]
    return cn
