"""AutoencoderKL with temporal decoder — the SVD video VAE, TPU-native.

Re-implements diffusers' ``AutoencoderKLTemporalDecoder`` (the pipeline component at
reference `pipeline/pipeline_stable_video_diffusion_trans.py:139,213,274`): a standard SD
image encoder producing per-frame latents, plus a *temporal* decoder whose resblocks carry
(3,1,1) temporal convs and whose output head applies a final temporal conv, giving
temporally-consistent RGB reconstruction.

Module names mirror the diffusers checkpoint layout (down_blocks_i/resnets_j,
mid_block/attentions_0, spatial_res_block/temporal_res_block/time_mixer, ...) so the weight
porter (utils/porting.py) maps tensors 1:1.

Channels-last: encode (B*T, H, W, 3) -> (B*T, h, w, 4); decode (B*T, h, w, 4) -> RGB.
``num_frames`` is static. scaling_factor = 0.18215 (SVD checkpoint).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lkgd_tpu.models.layers import GroupNorm
from lkgd_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class TemporalVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215


class VAEResnetBlock(nn.Module):
    """ResnetBlock2D without time embedding (VAE flavor, eps=1e-6)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = GroupNorm(32, 1e-6, dtype=self.dtype, act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(32, 1e-6, dtype=self.dtype, act="silu", name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAETemporalPart(nn.Module):
    """The temporal half of a decoder resblock: (3,1,1) convs over frames, eps=1e-5
    (diffusers TemporalResnetBlock without temb). Input (B, T, HW, C)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t = GroupNorm(32, 1e-5, dtype=self.dtype, act="silu", name="norm1")(x)
        t = nn.Conv(self.out_channels, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                    name="conv1")(t)
        t = GroupNorm(32, 1e-5, dtype=self.dtype, act="silu", name="norm2")(t)
        t = nn.Conv(self.out_channels, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                    name="conv2")(t)
        return x + t


class VAETemporalResnetBlock(nn.Module):
    """Spatial + temporal resblock pair with a learned blender (diffusers
    SpatioTemporalResBlock: merge_strategy="learned", merge_factor=0.0, temb=None)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        h = VAEResnetBlock(self.out_channels, dtype=self.dtype, name="spatial_res_block")(x)
        bf, H, W, C = h.shape
        b = bf // num_frames
        h_t = h.reshape(b, num_frames, H * W, C)
        t = VAETemporalPart(self.out_channels, dtype=self.dtype, name="temporal_res_block")(h_t)
        # merge_strategy="learned": alpha = sigmoid(mix), ignores image_only_indicator
        mix = self.param("mix_factor", nn.initializers.zeros, (1,))
        alpha = jax.nn.sigmoid(mix)[0].astype(h_t.dtype)
        out = alpha * h_t + (1.0 - alpha) * t
        return out.reshape(bf, H, W, C)


class VAEAttention(nn.Module):
    """Single-head VAE attention with GroupNorm and residual connection."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bf, H, W, C = x.shape
        h = GroupNorm(32, 1e-6, dtype=self.dtype, name="group_norm")(x).reshape(bf, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)[:, :, None, :]
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)[:, :, None, :]
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)[:, :, None, :]
        o = dot_product_attention(q, k, v).reshape(bf, H * W, C)
        o = nn.Dense(C, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(bf, H, W, C)


class DownEncoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = VAEResnetBlock(self.out_channels, dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_downsample:
            # diffusers encoder downsample: pad (0,1,0,1) then 3x3 stride-2, no padding
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
                        dtype=self.dtype, name="downsamplers_0")(x)
        return x


class Encoder(nn.Module):
    """SD VAE encoder (diffusers ``Encoder``)."""

    config: TemporalVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            h = DownEncoderBlock(ch, cfg.layers_per_block,
                                 add_downsample=i < len(cfg.block_out_channels) - 1,
                                 dtype=self.dtype, name=f"down_blocks_{i}")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnetBlock(ch, dtype=self.dtype, name="mid_block_resnets_0")(h)
        h = VAEAttention(ch, dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = VAEResnetBlock(ch, dtype=self.dtype, name="mid_block_resnets_1")(h)
        h = GroupNorm(32, 1e-6, dtype=self.dtype, act="silu", name="conv_norm_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class TemporalDecoder(nn.Module):
    """diffusers ``TemporalDecoder``: temporal resblocks + final (3,1,1) time conv."""

    config: TemporalVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        cfg = self.config
        chs = cfg.block_out_channels
        h = nn.Conv(chs[-1], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)

        h = VAETemporalResnetBlock(chs[-1], dtype=self.dtype,
                                   name="mid_block_resnets_0")(h, num_frames)
        h = VAEAttention(chs[-1], dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = VAETemporalResnetBlock(chs[-1], dtype=self.dtype,
                                   name="mid_block_resnets_1")(h, num_frames)

        for i, ch in enumerate(reversed(chs)):
            for j in range(cfg.layers_per_block + 1):
                h = VAETemporalResnetBlock(ch, dtype=self.dtype,
                                           name=f"up_blocks_{i}_resnets_{j}")(h, num_frames)
            if i < len(chs) - 1:
                from lkgd_tpu.models.blocks_svd import nearest_upsample_2x

                h = nearest_upsample_2x(h)
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_blocks_{i}_upsamplers_0")(h)

        h = GroupNorm(32, 1e-6, dtype=self.dtype, act="silu", name="conv_norm_out")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)

        # final temporal conv over frames: (B*T, H, W, 3) -> (B, T, H*W, 3) conv (3,1)
        bf, H, W, C = h.shape
        b = bf // num_frames
        ht = h.reshape(b, num_frames, H * W, C)
        ht = nn.Conv(cfg.out_channels, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                     name="time_conv_out")(ht)
        return ht.reshape(bf, H, W, C)


class AutoencoderKLTemporalDecoder(nn.Module):
    config: TemporalVAEConfig = TemporalVAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.decoder = TemporalDecoder(self.config, dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B*T, H, W, 3) -> (B*T, h, w, 2*latent) mean/logvar moments."""
        return self.quant_conv(self.encoder(x))

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Posterior mode (mean), the reference's ``latent_dist.mode()``."""
        moments = self.encode_moments(x)
        return moments[..., : self.config.latent_channels]

    def decode(self, z: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        """(B*T, h, w, latent) -> (B*T, H, W, 3). Caller divides by scaling_factor first."""
        return self.decoder(z, num_frames)

    def __call__(self, x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        z = self.encode_mode(x)
        return self.decode(z, num_frames)
