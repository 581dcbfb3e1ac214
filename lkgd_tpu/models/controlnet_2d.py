"""2D ControlNet — SD image ControlNet (reference `models/controlnet.py`, configurable
conditioning_channels, used by the inpaint+controlnet pipelines)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from lkgd_tpu.models.blocks_svd import Downsample2D, ResnetBlock2D
from lkgd_tpu.models.layers import TimestepEmbedding, get_timestep_embedding
from lkgd_tpu.models.unet_2d import ConditioningEmbedding, Transformer2DModel, UNet2DConfig


@dataclasses.dataclass(frozen=True)
class ControlNet2DConfig:
    unet: UNet2DConfig = UNet2DConfig()
    conditioning_channels: int = 3
    conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256)


class ControlNet2D(nn.Module):
    config: ControlNet2DConfig = ControlNet2DConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, controlnet_cond,
                 conditioning_scale: float = 1.0):
        cfg = self.config.unet
        b = sample.shape[0]
        t_emb = get_timestep_embedding(jnp.broadcast_to(jnp.atleast_1d(timesteps), (b,)),
                                       cfg.block_out_channels[0]).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)

        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                         name="conv_in")(sample.astype(self.dtype))
        sample = sample + ConditioningEmbedding(
            cfg.block_out_channels[0], self.config.conditioning_embedding_out_channels,
            dtype=self.dtype, name="controlnet_cond_embedding")(controlnet_cond)

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
                        cfg.cross_attention_dim,
                        block_path=f"down_blocks.{i}.attentions.{j}", dtype=self.dtype,
                        name=f"down_blocks_{i}_attentions_{j}")(sample, ehs)
                res_samples = res_samples + (sample,)
            if i < len(cfg.block_out_channels) - 1:
                sample = Downsample2D(ch, dtype=self.dtype,
                                      name=f"down_blocks_{i}_downsamplers_0")(sample)
                res_samples = res_samples + (sample,)

        ch = cfg.block_out_channels[-1]
        sample = ResnetBlock2D(ch, dtype=self.dtype, name="mid_block_resnets_0")(sample, emb)
        sample = Transformer2DModel(
            cfg.transformer_layers_per_block, cfg.num_attention_heads[-1],
            ch // cfg.num_attention_heads[-1], cfg.cross_attention_dim,
            block_path="mid_block.attentions.0", dtype=self.dtype,
            name="mid_block_attentions_0")(sample, ehs)
        sample = ResnetBlock2D(ch, dtype=self.dtype, name="mid_block_resnets_1")(sample, emb)

        down_res = []
        for i, r in enumerate(res_samples):
            out = nn.Conv(r.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name=f"controlnet_down_blocks_{i}")(r)
            down_res.append(out * conditioning_scale)
        mid = nn.Conv(sample.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                      dtype=self.dtype, name="controlnet_mid_block")(sample)
        return tuple(down_res), mid * conditioning_scale
