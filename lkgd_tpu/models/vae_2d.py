"""Standard AutoencoderKL (SD image VAE) — encoder shared with the temporal VAE.

The 2D pipelines (`/root/reference/pipeline/pipeline_stable_diffusion_*.py`) use the stock
SD VAE; this pairs models.vae_temporal.Encoder with a plain 2D decoder.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from lkgd_tpu.models.layers import GroupNorm
from lkgd_tpu.models.vae_temporal import Encoder, TemporalVAEConfig, VAEAttention, VAEResnetBlock


@dataclasses.dataclass(frozen=True)
class VAE2DConfig(TemporalVAEConfig):
    scaling_factor: float = 0.18215


class Decoder2D(nn.Module):
    config: VAE2DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        chs = cfg.block_out_channels
        h = nn.Conv(chs[-1], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(chs[-1], dtype=self.dtype, name="mid_block_resnets_0")(h)
        h = VAEAttention(chs[-1], dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = VAEResnetBlock(chs[-1], dtype=self.dtype, name="mid_block_resnets_1")(h)
        for i, ch in enumerate(reversed(chs)):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(ch, dtype=self.dtype,
                                   name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(chs) - 1:
                from lkgd_tpu.models.blocks_svd import nearest_upsample_2x

                h = nearest_upsample_2x(h)
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_blocks_{i}_upsamplers_0")(h)
        h = GroupNorm(32, 1e-6, dtype=self.dtype, act="silu", name="conv_norm_out")(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAE2DConfig = VAE2DConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.decoder = Decoder2D(self.config, dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.quant_conv(self.encoder(x))

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encode_moments(x)[..., : self.config.latent_channels]

    def encode_sample(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        m = self.encode_moments(x)
        mean = m[..., : self.config.latent_channels]
        logvar = jnp.clip(m[..., self.config.latent_channels:], -30.0, 20.0)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode_mode(x))
