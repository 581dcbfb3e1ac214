"""ViT-B/16-384 — the domain/flow latent-knowledge encoders, TPU-native.

The reference loads timm ``vit_base_patch16_384`` models with external MAE-pretrained
weights (typhoon / fluid phenomena) and feeds their pooled per-frame outputs into the
quaternion fusion (`/root/reference/train_models/train_svd_lora.py:1406-1433,1455-1466`;
CogVideo variant `finetune/models/cogvideox_i2v/lora_trainer.py:56-81`).

timm-compatible structure: fused qkv attention, pre-norm blocks, cls token + learned pos
embedding, final norm + classifier head (the reference consumes the *head output* as the
knowledge feature vector). Input: (B, 384, 384, 3) channels-last.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from lkgd_tpu.models.layers import LayerNorm
from lkgd_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    num_classes: int = 1000
    layer_norm_eps: float = 1e-6

    @classmethod
    def vit_base_patch16_384(cls) -> "ViTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ViTConfig":
        return cls(image_size=32, patch_size=8, hidden_size=32, depth=2, num_heads=2,
                   num_classes=48)


class ViTBlock(nn.Module):
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        d = cfg.hidden_size
        hd = d // cfg.num_heads
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)  # timm fused qkv
        b, s = h.shape[:2]
        q, k, v = jnp.split(qkv.reshape(b, s, 3, cfg.num_heads, hd), 3, axis=2)
        o = dot_product_attention(q[:, :, 0], k[:, :, 0], v[:, :, 0]).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="proj")(o)
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(d * cfg.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class ViT(nn.Module):
    config: ViTConfig = ViTConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, return_features: bool = False) -> jnp.ndarray:
        cfg = self.config
        b = pixel_values.shape[0]
        n = (cfg.image_size // cfg.patch_size) ** 2
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), dtype=self.dtype,
                    name="patch_embed")(pixel_values.astype(self.dtype))
        x = x.reshape(b, n, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype),
                                              (b, 1, cfg.hidden_size)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n + 1, cfg.hidden_size))
        x = x + pos.astype(self.dtype)
        for i in range(cfg.depth):
            x = ViTBlock(cfg, dtype=self.dtype, name=f"blocks_{i}")(x)
        x = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        if return_features:
            return x
        pooled = x[:, 0]  # cls token (timm default pooling for ViT)
        return nn.Dense(cfg.num_classes, dtype=self.dtype, name="head")(pooled)


def encode_knowledge_features(vit: ViT, params, frames: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, 3) [-1,1]-normalized frames -> (B, 1, num_classes) frame-averaged
    knowledge features (reference train_svd_lora.py:1455-1466: per-frame ViT at 384^2,
    mean over frames, keepdim)."""
    import jax

    b, t = frames.shape[:2]
    x = frames.reshape((b * t,) + frames.shape[2:])
    size = vit.config.image_size
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[-1]), method="bilinear")
    feats = vit.apply(params, x)  # (B*T, num_classes)
    feats = feats.reshape(b, t, -1).mean(axis=1, keepdims=True)
    return feats


def timm_vit_key_map(key: str):
    """timm vit_base_patch16_384 state-dict -> our paths (for utils.porting)."""
    k = key
    k = k.replace("patch_embed.proj", "patch_embed")
    k = k.replace("attn.qkv", "qkv").replace("attn.proj", "proj")
    k = k.replace("mlp.fc1", "fc1").replace("mlp.fc2", "fc2")
    if k in ("cls_token", "pos_embed"):
        return k
    return k
