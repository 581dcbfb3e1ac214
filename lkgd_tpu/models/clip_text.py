"""CLIP text encoder — SD2's OpenCLIP-H text tower, TPU-native.

Conditioning encoder for the 2D SD pipelines (the reference loads it via transformers
``CLIPTextModel`` inside its SD pipelines). Causal transformer over BPE token ids;
SD2 consumes the penultimate-layer hidden states (``clip_skip``/penultimate convention).
Pipelines may instead pass precomputed prompt embeddings (no tokenizer needed on-device).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from lkgd_tpu.models.clip_vision import CLIPVisionConfig
from lkgd_tpu.models.layers import LayerNorm


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_position_embeddings: int = 77
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5

    @classmethod
    def open_clip_h(cls) -> "CLIPTextConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=128, max_position_embeddings=16, hidden_size=32,
                   num_layers=2, num_heads=2, intermediate_size=64)


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, output_hidden_state_index: int = -1
                 ) -> jnp.ndarray:
        """(B, L) token ids -> (B, L, D) hidden states. ``output_hidden_state_index=-2``
        gives the penultimate layer (SD2 convention)."""
        cfg = self.config
        b, l = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.hidden_size))
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size))
        x = tok[input_ids].astype(self.dtype) + pos[None, :l].astype(self.dtype)

        causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
        vis_cfg = CLIPVisionConfig(hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
                                   intermediate_size=cfg.intermediate_size,
                                   hidden_act=cfg.hidden_act,
                                   layer_norm_eps=cfg.layer_norm_eps)
        n_run = cfg.num_layers if output_hidden_state_index == -1 else (
            cfg.num_layers + 1 + output_hidden_state_index)
        for i in range(n_run):
            x = CLIPTextLayer(vis_cfg, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        return LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)


class CLIPTextLayer(nn.Module):
    """CLIP encoder layer with a causal mask (shares structure with the vision layer)."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        from lkgd_tpu.ops.attention import dot_product_attention

        cfg = self.config
        d = cfg.hidden_size
        hd = d // cfg.num_heads
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        b, s = h.shape[:2]
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h).reshape(b, s, cfg.num_heads, hd)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h).reshape(b, s, cfg.num_heads, hd)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h).reshape(b, s, cfg.num_heads, hd)
        o = dot_product_attention(q, k, v, mask=mask).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(o)
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h
