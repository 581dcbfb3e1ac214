"""T5 v1.1 encoder — the CogVideoX text conditioner, rebuilt TPU-native.

The reference encodes prompts with T5-XXL (4096-d) via transformers and caches the
embeddings (`CogVideo-main/finetune/datasets/i2v_dataset.py:102-124`,
`models/cogvideox_i2v/lora_trainer.py` text_encoder). This module implements the
encoder stack itself in Flax — RMSNorm (no mean subtraction, fp32 accumulation),
bias-free projections, bucketed relative position bias shared from block 0, gated-GELU
feed-forward — so prompt encoding runs as one jitted TPU program and weights port from
any ``t5-v1_1-*`` / CogVideoX ``text_encoder`` torch checkpoint via
:func:`port_t5_encoder`. ``T5TextEncoder`` keeps the tokenizer-level convenience API
(tokenizer only from transformers; no transformers modeling code in the path).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6

    @classmethod
    def xxl(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4)


class T5LayerNorm(nn.Module):
    """T5 RMSNorm: no mean subtraction, no bias, variance in fp32."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.epsilon).astype(x.dtype)
                ) * w.astype(x.dtype)


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int,
                              max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing (q_pos - k_pos -> bucket id)."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    rel = mem - ctx  # relative_position
    half = num_buckets // 2
    bucket = jnp.where(rel > 0, half, 0)
    n = jnp.abs(rel)
    max_exact = half // 2
    is_small = n < max_exact
    log_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact) * (half - max_exact)).astype(jnp.int32)
    log_large = jnp.minimum(log_large, half - 1)
    return bucket + jnp.where(is_small, n, log_large)


class T5SelfAttention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, position_bias: Optional[jnp.ndarray],
                 mask: Optional[jnp.ndarray]):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        b, s, _ = x.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = k.reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.num_heads, cfg.d_kv)

        if position_bias is None:
            buckets = relative_position_buckets(
                s, s, cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance)
            table = self.param("relative_attention_bias",
                               nn.initializers.normal(1.0),
                               (cfg.relative_attention_num_buckets, cfg.num_heads))
            position_bias = table[buckets].transpose(2, 0, 1)[None]  # (1, H, S, S)

        # T5 applies NO 1/sqrt(d) scaling (folded into the init)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + position_bias.astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :].astype(bool), logits,
                               jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")(out), \
            position_bias


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias, mask):
        cfg = self.config
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                        name="attn_layer_norm")(x)
        attn, position_bias = T5SelfAttention(
            cfg, self.has_relative_bias, dtype=self.dtype, name="SelfAttention")(
            h, position_bias, mask)
        x = x + attn
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                        name="ff_layer_norm")(x)
        # v1.1 gated-GELU: wi_0 (gate, gelu) * wi_1, then wo
        g = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h)
        u = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
        h = nn.gelu(g, approximate=True) * u
        return x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                            name="wo")(h), position_bias


class T5Encoder(nn.Module):
    """Token ids (B, S) int32 -> hidden states (B, S, d_model)."""

    config: T5Config = T5Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        emb = self.param("shared_embedding", nn.initializers.normal(1.0),
                         (cfg.vocab_size, cfg.d_model))
        x = emb[input_ids].astype(self.dtype)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(cfg, has_relative_bias=(i == 0),
                                       dtype=self.dtype, name=f"block_{i}")(
                x, position_bias, attention_mask)
        return T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                           name="final_layer_norm")(x)


def port_t5_encoder(state_dict, config: T5Config, dtype=jnp.float32) -> dict:
    """transformers T5EncoderModel ``state_dict`` -> T5Encoder params. Handles both
    ``encoder.block...`` and bare ``block...`` prefixes plus ``shared.weight``."""

    def get(key):
        for pref in ("", "encoder."):
            if pref + key in state_dict:
                return np.asarray(state_dict[pref + key])
        raise KeyError(key)

    p = {"shared_embedding": get("shared.weight")
         if any("shared.weight" in k for k in state_dict) else get("embed_tokens.weight"),
         "final_layer_norm": {"weight": get("final_layer_norm.weight")}}
    for i in range(config.num_layers):
        blk = {}
        sa = {"q": f"block.{i}.layer.0.SelfAttention.q.weight",
              "k": f"block.{i}.layer.0.SelfAttention.k.weight",
              "v": f"block.{i}.layer.0.SelfAttention.v.weight",
              "o": f"block.{i}.layer.0.SelfAttention.o.weight"}
        blk["SelfAttention"] = {n: {"kernel": get(k).T} for n, k in sa.items()}
        if i == 0:
            blk["SelfAttention"]["relative_attention_bias"] = get(
                f"block.{i}.layer.0.SelfAttention.relative_attention_bias.weight")
        blk["attn_layer_norm"] = {"weight": get(f"block.{i}.layer.0.layer_norm.weight")}
        blk["wi_0"] = {"kernel": get(f"block.{i}.layer.1.DenseReluDense.wi_0.weight").T}
        blk["wi_1"] = {"kernel": get(f"block.{i}.layer.1.DenseReluDense.wi_1.weight").T}
        blk["wo"] = {"kernel": get(f"block.{i}.layer.1.DenseReluDense.wo.weight").T}
        blk["ff_layer_norm"] = {"weight": get(f"block.{i}.layer.1.layer_norm.weight")}
        p[f"block_{i}"] = blk
    # cast at port time: the XXL target is ~4.7B params — fp32 would not fit 16 GB HBM
    return {"params": jax.tree.map(lambda x: jnp.asarray(x, dtype), p)}


class T5TextEncoder:
    """Tokenizer + jitted T5Encoder. ``model_path`` must hold the checkpoint files
    (tokenizer + torch safetensors/bin); pad/truncate to ``max_length`` = 226 like
    CogVideoX (`finetune/datasets/i2v_dataset.py:102-124`)."""

    def __init__(self, model_path: str, max_length: int = 226, dtype=jnp.bfloat16,
                 config: Optional[T5Config] = None):
        import glob
        import os

        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.config = config or T5Config.xxl()
        self.model = T5Encoder(self.config, dtype=dtype)
        sd = {}
        for f in sorted(glob.glob(os.path.join(model_path, "*.safetensors"))):
            from lkgd_tpu.utils.porting import load_safetensors

            sd.update(load_safetensors(f))
        if not sd:
            import torch

            for f in sorted(glob.glob(os.path.join(model_path, "*.bin"))):
                sd.update({k: v.numpy() for k, v in
                           torch.load(f, map_location="cpu", weights_only=True).items()})
        self.params = port_t5_encoder(sd, self.config, dtype)
        self.max_length = max_length
        self._encode = jax.jit(self.model.apply)

    def encode(self, prompts) -> np.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        tokens = self.tokenizer(prompts, padding="max_length", truncation=True,
                                max_length=self.max_length, return_tensors="np")
        out = self._encode(self.params, jnp.asarray(tokens["input_ids"]),
                           jnp.asarray(tokens["attention_mask"]))
        return np.asarray(out.astype(jnp.float32))
