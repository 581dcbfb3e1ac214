"""CogVLM2 video captioner (THUDM/cogvlm2-llama3-caption) — CogVideoX's data engine.

The reference pseudo-labels training videos with CogVLM2-Caption
(`/root/reference/CogVideo-main/tools/caption/video_caption.py`: frames -> EVA-CLIP
vision tower -> LLaMA3 LM with *visual experts* -> greedy caption). This is the
TPU-native rebuild of that model family:

  * the LM's dual-expert routing (separate QKV/dense/MLP weights for vision vs text
    positions, selected by ``token_type``) is a masked branch select — the same static
    stream-routing pattern as the repo's joint-attention LoRA masks, fully
    vectorized (no per-token gather of weight matrices)
  * GQA attention runs through ``ops.attention.dot_product_attention`` (flash-eligible),
    RoPE in fp32; RMSNorm matches LLaMA3 semantics
  * the EVA vision tower keeps CogVLM's post-sublayer LayerNorm quirk
    (``hidden += ln(attn(hidden))`` — THUDM visual.py TransformerLayer), 2x2 conv
    downsample and the SwiGLU GLU adapter with boi/eoi boundary tokens
  * greedy decode is one jitted ``lax.scan`` at a fixed padded length (BLIP pattern,
    models/blip.py:200) — no KV cache; fine for caption-length outputs

Weight porting targets the THUDM ``modeling_cogvlm.py``/``visual.py`` state-dict naming
(``model.layers.N.self_attn.vision_expert_query_key_value`` etc.); tokenization (LLaMA3
BPE) is external — the CLI accepts pre-tokenized prompts or uses ``transformers`` when
available. RoPE positions default to CogVLM's compressed vision-token scheme
(``build_position_ids``: contiguous vision spans share one position); pass
``position_ids`` to override.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CogVLMConfig:
    # language model (LLaMA3-8B base)
    vocab_size: int = 128256
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    intermediate_size: int = 14336
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    # vision tower (EVA2-CLIP-E)
    vision_hidden: int = 1792
    vision_layers: int = 63
    vision_heads: int = 16
    vision_intermediate: int = 15360
    patch_size: int = 14
    image_size: int = 224
    # decode
    bos_token_id: int = 128000
    eos_token_id: int = 128001
    pad_token_id: int = 128002

    @classmethod
    def caption_8b(cls) -> "CogVLMConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CogVLMConfig":
        return cls(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                   num_kv_heads=2, intermediate_size=64, vision_hidden=24,
                   vision_layers=2, vision_heads=2, vision_intermediate=48,
                   patch_size=8, image_size=32, bos_token_id=1, eos_token_id=2,
                   pad_token_id=0)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def tokens_per_frame(self) -> int:
        return (self.image_size // self.patch_size // 2) ** 2


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + eps)
    return (x32 * scale.astype(jnp.float32)).astype(x.dtype)


def rotary(x: jnp.ndarray, position_ids: jnp.ndarray, theta: float) -> jnp.ndarray:
    """LLaMA rotate-half RoPE on (B, S, H, D), positions (B, S), fp32 trig."""
    d = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = position_ids[..., None].astype(jnp.float32) * inv  # (B, S, D/2)
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class _ExpertDense(nn.Module):
    """Dual-expert linear: out = where(vision_mask, x @ W_vis, x @ W_lang).

    Both experts run on the full sequence (two MXU matmuls, no gathers) — on TPU that
    beats any per-token weight select, and caption prompts are mostly one modality."""

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, vision_mask: jnp.ndarray) -> jnp.ndarray:
        vis = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                       name="vision")(x)
        lang = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                        name="language")(x)
        return jnp.where(vision_mask[..., None], vis, lang)


class CogVLMDecoderLayer(nn.Module):
    cfg: CogVLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vision_mask, position_ids, attn_mask):
        cfg = self.cfg
        d, hd = cfg.hidden_size, cfg.head_dim
        kv_dim = cfg.num_kv_heads * hd
        res = x
        h = rms_norm(x, self.param("input_layernorm", nn.initializers.ones, (d,)), cfg.rms_eps)
        qkv = _ExpertDense(d + 2 * kv_dim, use_bias=True, dtype=self.dtype,
                           name="qkv")(h, vision_mask)
        q, k, v = jnp.split(qkv, [d, d + kv_dim], axis=-1)
        b, s = h.shape[:2]
        q = rotary(q.reshape(b, s, cfg.num_heads, hd), position_ids, cfg.rope_theta)
        k = rotary(k.reshape(b, s, cfg.num_kv_heads, hd), position_ids, cfg.rope_theta)
        v = v.reshape(b, s, cfg.num_kv_heads, hd)
        rep = cfg.num_heads // cfg.num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        att = dot_product_attention(q, k, v, mask=attn_mask)
        att = _ExpertDense(d, dtype=self.dtype, name="dense")(
            att.reshape(b, s, d), vision_mask)
        x = res + att

        res = x
        h = rms_norm(x, self.param("post_attention_layernorm", nn.initializers.ones, (d,)),
                     cfg.rms_eps)
        gate = _ExpertDense(cfg.intermediate_size, dtype=self.dtype, name="gate_proj")(
            h, vision_mask)
        up = _ExpertDense(cfg.intermediate_size, dtype=self.dtype, name="up_proj")(
            h, vision_mask)
        down = _ExpertDense(d, dtype=self.dtype, name="down_proj")(
            nn.silu(gate) * up, vision_mask)
        return res + down


class EVAVisionLayer(nn.Module):
    """CogVLM visual.py TransformerLayer: LayerNorm applied to the SUBLAYER OUTPUT
    (hidden += ln(attn(hidden)); hidden += ln(mlp(hidden)))."""

    cfg: CogVLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, s, d = x.shape
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="query_key_value")(x)
        q, k, v = jnp.split(qkv.reshape(b, s, 3, cfg.vision_heads, d // cfg.vision_heads),
                            3, axis=2)
        att = dot_product_attention(q[:, :, 0], k[:, :, 0], v[:, :, 0])
        att = nn.Dense(d, dtype=self.dtype, name="dense")(att.reshape(b, s, d))
        x = x + nn.LayerNorm(dtype=self.dtype, name="input_layernorm")(att)
        h = nn.Dense(cfg.vision_intermediate, dtype=self.dtype, name="fc1")(x)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(nn.gelu(h, approximate=False))
        return x + nn.LayerNorm(dtype=self.dtype, name="post_attention_layernorm")(h)


class EVAVisionModel(nn.Module):
    """EVA2-CLIP tower + 2x2 conv downsample + SwiGLU GLU adapter + boi/eoi tokens.

    frames (B*T, H, W, 3) -> (B*T, tokens_per_frame, lm_hidden); the caller concatenates
    frames along the sequence and wraps with boi/eoi (``image_features``)."""

    cfg: CogVLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        p = cfg.patch_size
        x = nn.Conv(cfg.vision_hidden, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embedding")(pixels)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        cls = self.param("cls_embedding", nn.initializers.normal(0.02), (1, 1, d))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)).astype(x.dtype), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, d))
        x = x + pos.astype(x.dtype)
        for i in range(cfg.vision_layers):
            x = EVAVisionLayer(cfg, self.dtype, name=f"layers_{i}")(x)
        x = x[:, 1:]  # drop cls
        x = x.reshape(b, gh, gw, d)
        x = nn.Conv(cfg.hidden_size, (2, 2), strides=(2, 2), dtype=self.dtype,
                    name="conv")(x)
        x = x.reshape(b, -1, cfg.hidden_size)
        # GLU adapter (visual.py GLU)
        x = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                     name="linear_proj")(x)
        x = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="norm1")(x), approximate=False)
        gate = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype,
                        name="gate_proj")(x)
        h = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype,
                     name="dense_h_to_4h")(x)
        x = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                     name="dense_4h_to_h")(nn.silu(gate) * h)
        return x


def build_position_ids(vision_mask: jnp.ndarray) -> jnp.ndarray:
    """CogVLM RoPE position compression (THUDM modeling_cogvlm.py build_position_ids):
    every language token advances the position; a vision token advances it only when it
    STARTS a contiguous vision block, so all tokens of one vision span share a single
    rotary position. boi/eoi are language-typed here (``__call__`` clears them in
    ``vision_mask``), so they increment like THUDM's boundary handling. With an
    all-False mask this degrades to a plain arange (the pure-text parity case)."""
    v = vision_mask.astype(jnp.int32)
    prev = jnp.pad(v[:, :-1], ((0, 0), (1, 0)))
    increment = 1 - (v & prev)  # vision-after-vision shares its block's position
    return jnp.cumsum(increment, axis=-1) - 1


class CogVLMVideoCaptioner(nn.Module):
    """Vision frames + token ids -> next-token logits (teacher-forced or decode)."""

    cfg: CogVLMConfig = CogVLMConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision = EVAVisionModel(self.cfg, self.dtype)
        self.embed_tokens = nn.Embed(self.cfg.vocab_size, self.cfg.hidden_size,
                                     dtype=self.dtype)
        self.layers = [CogVLMDecoderLayer(self.cfg, self.dtype, name=f"layers_{i}")
                       for i in range(self.cfg.num_layers)]
        self.boi = self.param("boi", nn.initializers.zeros, (1, 1, self.cfg.hidden_size))
        self.eoi = self.param("eoi", nn.initializers.zeros, (1, 1, self.cfg.hidden_size))
        self.final_norm = self.param("final_norm", nn.initializers.ones,
                                     (self.cfg.hidden_size,))
        self.lm_head = nn.Dense(self.cfg.vocab_size, use_bias=False, dtype=self.dtype)

    def image_features(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 3) -> (B, 2 + T*tokens_per_frame, hidden): [boi | frames | eoi]."""
        b, t = frames.shape[:2]
        feats = self.vision(frames.reshape((b * t,) + frames.shape[2:]))
        feats = feats.reshape(b, -1, self.cfg.hidden_size)
        boi = jnp.broadcast_to(self.boi, (b, 1, self.cfg.hidden_size)).astype(feats.dtype)
        eoi = jnp.broadcast_to(self.eoi, (b, 1, self.cfg.hidden_size)).astype(feats.dtype)
        return jnp.concatenate([boi, feats, eoi], axis=1)

    def lm(self, embeds: jnp.ndarray, vision_mask: jnp.ndarray,
           position_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, s, _ = embeds.shape
        if position_ids is None:
            position_ids = build_position_ids(vision_mask)
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        x = embeds
        for layer in self.layers:
            x = layer(x, vision_mask, position_ids, causal)
        x = rms_norm(x, self.final_norm, self.cfg.rms_eps)
        return self.lm_head(x)

    def __call__(self, frames: jnp.ndarray, input_ids: jnp.ndarray,
                 position_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """frames (B, T, H, W, 3) in [-1, 1]-normalized CLIP space; input_ids (B, S)
        prompt+caption ids. Vision features are prepended to the token embeddings."""
        img = self.image_features(frames)
        txt = self.embed_tokens(input_ids)
        embeds = jnp.concatenate([img, txt], axis=1)
        n_img = img.shape[1]
        vision_mask = jnp.concatenate(
            [jnp.ones((input_ids.shape[0], n_img), bool),
             jnp.zeros(input_ids.shape, bool)], axis=1)
        # boi/eoi positions are text-expert in CogVLM; keep the whole image span vision
        # except the boundary tokens
        vision_mask = vision_mask.at[:, 0].set(False).at[:, n_img - 1].set(False)
        logits = self.lm(embeds, vision_mask, position_ids)
        return logits[:, n_img:]  # logits over the text span



@functools.lru_cache(maxsize=8)
def _greedy_decode_fn(model: CogVLMVideoCaptioner, b: int, n_prompt: int,
                      max_new_tokens: int):
    """One jitted decode program per (model config, batch, prompt-length) — cached so
    captioning a directory of same-shape videos compiles the 8B forward ONCE, not once
    per file (linen modules are frozen dataclasses, hence hashable cache keys)."""
    cfg = model.cfg
    total = n_prompt + max_new_tokens

    @jax.jit
    def run(params, frames, prompt_ids):
        ids0 = jnp.full((b, total), cfg.pad_token_id, jnp.int32)
        ids0 = jax.lax.dynamic_update_slice(ids0, prompt_ids, (0, 0))

        def step(ids, i):
            logits = model.apply(params, frames, ids)
            pos = n_prompt + i - 1
            nxt = jnp.argmax(logits[:, pos], axis=-1).astype(jnp.int32)
            done = jnp.any(ids == cfg.eos_token_id, axis=-1)
            nxt = jnp.where(done, cfg.pad_token_id, nxt)
            return ids.at[:, n_prompt + i].set(nxt), ()

        ids, _ = jax.lax.scan(step, ids0, jnp.arange(max_new_tokens))
        return ids[:, n_prompt:]

    return run


def greedy_video_caption(model: CogVLMVideoCaptioner, params, frames: jnp.ndarray,
                         prompt_ids: np.ndarray, max_new_tokens: int = 64) -> np.ndarray:
    """Greedy decode (video_caption.py gen_kwargs: do_sample=False/top_k=1): returns
    (B, max_new_tokens) generated ids, EOS-terminated, PAD-filled."""
    prompt_ids = jnp.asarray(prompt_ids, jnp.int32)
    b, n_prompt = prompt_ids.shape
    run = _greedy_decode_fn(model, b, n_prompt, max_new_tokens)
    return np.asarray(run(params, frames, prompt_ids))


# ------------------------------------------------------------------ porting
def cogvlm_key_map(key: str) -> Optional[str]:
    """THUDM modeling_cogvlm.py / visual.py state-dict naming -> our paths."""
    import re

    k = key
    if k.startswith("model."):
        k = k[len("model."):]
    if "rotary_emb" in k:
        return None
    # vision tower first — its layernorms keep module form (LayerNorm scale/bias),
    # unlike the LM's bare RMSNorm weight params
    if k.startswith("vision."):
        v = k[len("vision."):]
        v = re.sub(r"^transformer\.layers\.(\d+)\.", r"layers_\1.", v)
        v = v.replace("attention.query_key_value", "query_key_value")
        v = v.replace("attention.dense", "dense")
        v = v.replace("mlp.fc1", "fc1").replace("mlp.fc2", "fc2")
        v = v.replace("patch_embedding.cls_embedding", "cls_embedding")
        v = v.replace("patch_embedding.position_embedding.weight", "position_embedding")
        v = v.replace("patch_embedding.proj", "patch_embedding")
        v = v.replace("linear_proj.linear_proj", "linear_proj")
        v = v.replace("linear_proj.norm1", "norm1")
        v = v.replace("linear_proj.gate_proj", "gate_proj")
        v = v.replace("linear_proj.dense_h_to_4h", "dense_h_to_4h")
        v = v.replace("linear_proj.dense_4h_to_h", "dense_4h_to_h")
        if v.startswith(("boi", "eoi")):
            return v
        return "vision." + v
    k = re.sub(r"^layers\.(\d+)\.", r"layers_\1.", k)
    k = k.replace("self_attn.vision_expert_query_key_value", "qkv.vision")
    k = k.replace("self_attn.language_expert_query_key_value", "qkv.language")
    k = k.replace("self_attn.vision_expert_dense", "dense.vision")
    k = k.replace("self_attn.language_expert_dense", "dense.language")
    for proj in ("gate_proj", "up_proj", "down_proj"):
        k = k.replace(f"mlp.vision_mlp.{proj}", f"{proj}.vision")
        k = k.replace(f"mlp.language_mlp.{proj}", f"{proj}.language")
    k = k.replace("input_layernorm.weight", "input_layernorm")
    k = k.replace("post_attention_layernorm.weight", "post_attention_layernorm")
    if k == "norm.weight":
        return "final_norm"
    k = k.replace("embed_tokens.weight", "embed_tokens.embedding")
    return k


def port_cogvlm(state_dict, template, strict: bool = True, materialize: bool = True):
    """Port a CogVLM2 state dict into a ``CogVLMVideoCaptioner`` template."""
    from lkgd_tpu.utils.porting import port_state_dict

    return port_state_dict(state_dict, template, key_map=cogvlm_key_map, strict=strict,
                           materialize=materialize)
