"""CLIP vision encoder with projection — SVD's image conditioner, TPU-native.

Re-implements transformers' ``CLIPVisionModelWithProjection`` as configured by SVD
(laion/CLIP-ViT-H-14: patch 14, width 1280, 32 layers, 16 heads, gelu, projection 1024;
consumed at reference `pipeline/pipeline_stable_video_diffusion_trans.py:140,157-203`).
Returns the projected pooled embedding ``image_embeds`` of shape (B, projection_dim).

Input: (B, 224, 224, 3) channels-last, already CLIP-normalized.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from lkgd_tpu.models.layers import LayerNorm
from lkgd_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    projection_dim: int = 1024
    hidden_act: str = "gelu"  # laion ViT-H; openai models use quick_gelu
    layer_norm_eps: float = 1e-5

    @classmethod
    def vit_h_14(cls) -> "CLIPVisionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(image_size=32, patch_size=8, hidden_size=64, num_layers=2, num_heads=2,
                   intermediate_size=128, projection_dim=32)


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(name)


class CLIPEncoderLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        d = cfg.hidden_size
        hd = d // cfg.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h)
        b, s = h.shape[:2]
        o = dot_product_attention(
            q.reshape(b, s, cfg.num_heads, hd), k.reshape(b, s, cfg.num_heads, hd),
            v.reshape(b, s, cfg.num_heads, hd)).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(o)

        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPVisionModelWithProjection(nn.Module):
    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = pixel_values.shape[0]
        n_patches = (cfg.image_size // cfg.patch_size) ** 2

        patch_embeds = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                               strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                               dtype=self.dtype, name="patch_embedding")(
                                   pixel_values.astype(self.dtype))
        patch_embeds = patch_embeds.reshape(b, n_patches, cfg.hidden_size)
        class_embed = self.param("class_embedding", nn.initializers.normal(0.02),
                                 (cfg.hidden_size,)).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(class_embed, (b, 1, cfg.hidden_size)),
                             patch_embeds], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_patches + 1, cfg.hidden_size)).astype(self.dtype)
        x = x + pos[None]

        x = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm")(x)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        pooled = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(pooled)


# CLIP preprocessing constants (transformers CLIPImageProcessor defaults)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """Normalize [0,1] (B, H, W, 3) images with CLIP mean/std."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (images - mean) / std
