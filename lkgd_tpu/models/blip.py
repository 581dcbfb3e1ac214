"""BLIP image captioner (ViT encoder + BERT-style cross-attention text decoder).

The reference captions inversion prompts with HF ``BlipForConditionalGeneration``
(`/root/reference/utils/util.py:310-329`, ``blip_cap``) and CogVideo's caption tooling
uses the same family (`CogVideo-main/tools/caption/`). Checkpoint weights
(``Salesforce/blip-image-captioning-*``) are external; this module is the TPU-native
architecture + a porter keyed to the exact HF state-dict naming
(``vision_model.encoder.layers.N...``, ``text_decoder.bert.encoder.layer.N...``), so real
weights drop straight in. Parity is oracle-tested against transformers' torch BLIP on a
randomly-initialized tiny config (tests/test_blip.py).

TPU design: both towers are static-shape matmul stacks (MXU path). Captioning runs the
decoder at a fixed padded length with a causal mask — one jitted program, greedy argmax
on device, no dynamic shapes (KV-cache incrementality buys nothing at caption lengths
of ~20 tokens).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    # vision (ViT-L/16 for captioning-large; ViT-B/16 for -base)
    image_size: int = 384
    patch_size: int = 16
    vision_hidden: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    vision_intermediate: int = 4096
    # text decoder (BERT-base geometry)
    vocab_size: int = 30524
    text_hidden: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_intermediate: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    bos_token_id: int = 30522  # [DEC]
    sep_token_id: int = 102    # [SEP] terminates the caption
    pad_token_id: int = 0

    @classmethod
    def large(cls) -> "BlipConfig":
        return cls()

    @classmethod
    def base(cls) -> "BlipConfig":
        return cls(vision_hidden=768, vision_layers=12, vision_heads=12,
                   vision_intermediate=3072)


def _attn(q, k, v, heads, mask=None):
    b, sq, d = q.shape
    hd = d // heads
    q = q.reshape(b, sq, heads, hd)
    k = k.reshape(b, k.shape[1], heads, hd)
    v = v.reshape(b, v.shape[1], heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
    if mask is not None:
        s = s + mask
    return jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, axis=-1),
                      v).reshape(b, sq, d)


class _VisionLayer(nn.Module):
    cfg: BlipConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="layer_norm1")(x)
        qkv = nn.Dense(3 * cfg.vision_hidden, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        h = _attn(q, k, v, cfg.vision_heads)
        x = x + nn.Dense(cfg.vision_hidden, dtype=self.dtype, name="projection")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.vision_intermediate, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(cfg.vision_hidden, dtype=self.dtype, name="fc2")(h)


class BlipVisionModel(nn.Module):
    """(B, H, W, 3) normalized pixels -> (B, 1+N, D) pre-norm ViT features."""

    cfg: BlipConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        b = pixels.shape[0]
        x = nn.Conv(cfg.vision_hidden, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embedding")(pixels)
        x = x.reshape(b, -1, cfg.vision_hidden)
        cls_tok = self.param("class_embedding", nn.initializers.normal(0.02),
                             (1, 1, cfg.vision_hidden))
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, cfg.vision_hidden)), x], 1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, n_pos, cfg.vision_hidden))
        x = x + pos[:, : x.shape[1]]
        for i in range(cfg.vision_layers):
            x = _VisionLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="post_layernorm")(x)


class _BertAttention(nn.Module):
    """Post-LN BERT attention block (self or cross)."""

    cfg: BlipConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv, mask):
        cfg = self.cfg
        q = nn.Dense(cfg.text_hidden, dtype=self.dtype, name="query")(x)
        k = nn.Dense(cfg.text_hidden, dtype=self.dtype, name="key")(kv)
        v = nn.Dense(cfg.text_hidden, dtype=self.dtype, name="value")(kv)
        h = _attn(q, k, v, cfg.text_heads, mask)
        h = nn.Dense(cfg.text_hidden, dtype=self.dtype, name="dense")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(x + h)


class _TextLayer(nn.Module):
    cfg: BlipConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, causal_mask):
        cfg = self.cfg
        x = _BertAttention(cfg, dtype=self.dtype,
                           name="attention")(x, x, causal_mask)
        x = _BertAttention(cfg, dtype=self.dtype,
                           name="crossattention")(x, enc, None)
        h = nn.Dense(cfg.text_intermediate, dtype=self.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.text_hidden, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_LayerNorm")(x + h)


class BlipTextDecoder(nn.Module):
    """(B, S) token ids + encoder states -> (B, S, vocab) logits, causal."""

    cfg: BlipConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, encoder_states):
        cfg = self.cfg
        s = input_ids.shape[1]
        word = nn.Embed(cfg.vocab_size, cfg.text_hidden, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.text_hidden, dtype=self.dtype,
                       name="position_embeddings")(jnp.arange(s)[None])
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_LayerNorm")(word + pos)
        causal = jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0,
                           jnp.finfo(jnp.float32).min)[None, None]
        for i in range(cfg.text_layers):
            x = _TextLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x, encoder_states,
                                                                     causal)
        h = nn.Dense(cfg.text_hidden, dtype=self.dtype, name="transform_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="transform_LayerNorm")(h)
        return nn.Dense(cfg.vocab_size, dtype=self.dtype, name="decoder")(h)


class BlipCaptioner(nn.Module):
    cfg: BlipConfig = BlipConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision_model = BlipVisionModel(self.cfg, dtype=self.dtype)
        self.text_decoder = BlipTextDecoder(self.cfg, dtype=self.dtype)

    def __call__(self, pixels, input_ids):
        return self.text_decoder(input_ids, self.vision_model(pixels))

    def encode(self, pixels):
        return self.vision_model(pixels)

    def decode(self, input_ids, encoder_states):
        return self.text_decoder(input_ids, encoder_states)


def greedy_caption(model: BlipCaptioner, params, pixels: jnp.ndarray,
                   max_length: int = 20) -> np.ndarray:
    """Greedy decode at a fixed padded length: one jitted scan over decode steps, the
    whole (B, max_length) causal decoder re-run per step (static shapes; fine at
    caption lengths). Returns (B, max_length) int32 ids, SEP-terminated."""
    cfg = model.cfg

    @jax.jit
    def run(params, pixels):
        enc = model.apply(params, pixels, method=BlipCaptioner.encode)
        b = pixels.shape[0]
        ids0 = jnp.full((b, max_length), cfg.pad_token_id, jnp.int32)
        ids0 = ids0.at[:, 0].set(cfg.bos_token_id)

        def step(ids, i):
            logits = model.apply(params, ids, enc, method=BlipCaptioner.decode)
            nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
            done = jnp.any(ids == cfg.sep_token_id, axis=-1)
            nxt = jnp.where(done, cfg.pad_token_id, nxt)
            return ids.at[:, i + 1].set(nxt), ()

        ids, _ = jax.lax.scan(step, ids0, jnp.arange(max_length - 1))
        return ids

    return np.asarray(run(params, pixels))


# ------------------------------------------------------------------ porting
def port_blip(state_dict, cfg: BlipConfig = BlipConfig()) -> dict:
    """HF ``BlipForConditionalGeneration`` state dict (numpy values) -> flax params.
    Dense (O, I) -> (I, O); conv (O, I, kh, kw) -> (kh, kw, I, O)."""

    def g(key):
        return np.asarray(state_dict[key], np.float32)

    def dense(key):
        return {"kernel": jnp.asarray(g(f"{key}.weight").T),
                "bias": jnp.asarray(g(f"{key}.bias"))}

    def ln(key):
        return {"scale": jnp.asarray(g(f"{key}.weight")),
                "bias": jnp.asarray(g(f"{key}.bias"))}

    vis: dict = {
        "class_embedding": jnp.asarray(
            g("vision_model.embeddings.class_embedding").reshape(1, 1, -1)),
        "position_embedding": jnp.asarray(
            g("vision_model.embeddings.position_embedding").reshape(
                1, -1, cfg.vision_hidden)),
        "patch_embedding": {
            "kernel": jnp.asarray(np.transpose(
                g("vision_model.embeddings.patch_embedding.weight"), (2, 3, 1, 0))),
            "bias": jnp.asarray(g("vision_model.embeddings.patch_embedding.bias"))},
        "post_layernorm": ln("vision_model.post_layernorm"),
    }
    for i in range(cfg.vision_layers):
        p = f"vision_model.encoder.layers.{i}"
        vis[f"layers_{i}"] = {
            "layer_norm1": ln(f"{p}.layer_norm1"),
            "layer_norm2": ln(f"{p}.layer_norm2"),
            "qkv": dense(f"{p}.self_attn.qkv"),
            "projection": dense(f"{p}.self_attn.projection"),
            "fc1": dense(f"{p}.mlp.fc1"),
            "fc2": dense(f"{p}.mlp.fc2"),
        }

    txt: dict = {
        "word_embeddings": {"embedding": jnp.asarray(
            g("text_decoder.bert.embeddings.word_embeddings.weight"))},
        "position_embeddings": {"embedding": jnp.asarray(
            g("text_decoder.bert.embeddings.position_embeddings.weight"))},
        "embeddings_LayerNorm": ln("text_decoder.bert.embeddings.LayerNorm"),
        "transform_dense": dense("text_decoder.cls.predictions.transform.dense"),
        "transform_LayerNorm": ln("text_decoder.cls.predictions.transform.LayerNorm"),
        "decoder": {"kernel": jnp.asarray(g("text_decoder.cls.predictions.decoder.weight").T),
                    "bias": jnp.asarray(g("text_decoder.cls.predictions.bias"))},
    }
    for i in range(cfg.text_layers):
        p = f"text_decoder.bert.encoder.layer.{i}"
        layer: dict = {}
        for ours, theirs in (("attention", "attention"),
                             ("crossattention", "crossattention")):
            layer[ours] = {
                "query": dense(f"{p}.{theirs}.self.query"),
                "key": dense(f"{p}.{theirs}.self.key"),
                "value": dense(f"{p}.{theirs}.self.value"),
                "dense": dense(f"{p}.{theirs}.output.dense"),
                "LayerNorm": ln(f"{p}.{theirs}.output.LayerNorm"),
            }
        layer["intermediate"] = dense(f"{p}.intermediate.dense")
        layer["output"] = dense(f"{p}.output.dense")
        layer["output_LayerNorm"] = ln(f"{p}.output.LayerNorm")
        txt[f"layer_{i}"] = layer

    return {"params": {"vision_model": vis, "text_decoder": txt}}


# normalization constants of the HF BlipProcessor (OpenAI CLIP statistics)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_images(images: np.ndarray, image_size: int = 384) -> jnp.ndarray:
    """[0,1] (B, H, W, 3) -> normalized (B, S, S, 3) model pixels (bicubic resize)."""
    import cv2

    out = np.stack([cv2.resize(im, (image_size, image_size),
                               interpolation=cv2.INTER_CUBIC) for im in images])
    return jnp.asarray((out - IMAGE_MEAN) / IMAGE_STD, jnp.float32)
