"""SegFormer semantic segmentation — the framework's native segmentation annotator.

The reference's segmentation pseudo-labeling (`/root/reference/annotate/
annotate_segmentation.py:31-33`) imports OneFormer detectors from an EXTERNAL repo via a
sys.path hack (ControlNet-v1-1-nightly) — segmentation is an external dependency even
there. This module provides the in-framework backend for the same registry slot
(``utils.control_preprocess`` "segmentation"): a TPU-native SegFormer (Xie et al. 2021,
``nvidia/segformer-b4-finetuned-ade-512-512`` et al.), producing the ADE20K semantic map
ControlNet conditioning consumes.

TPU design notes: the hierarchical MiT encoder is channels-last; efficient attention's
spatial-reduction is a strided conv (MXU); Mix-FFN's depthwise 3x3 uses
``feature_group_count``; the all-MLP decode head fuses at the 1/4 grid. Porting targets
the HF ``SegformerForSemanticSegmentation`` state dict (oracle-tested in
tests/test_segformer.py against the transformers torch implementation).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    hidden_sizes: Tuple[int, ...] = (64, 128, 320, 512)
    depths: Tuple[int, ...] = (3, 8, 27, 3)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    strides: Tuple[int, ...] = (4, 2, 2, 2)
    mlp_ratio: int = 4
    decoder_hidden: int = 768
    num_labels: int = 150
    eps: float = 1e-6

    @classmethod
    def b4_ade(cls) -> "SegformerConfig":
        return cls()

    @classmethod
    def b0_ade(cls) -> "SegformerConfig":
        return cls(hidden_sizes=(32, 64, 160, 256), depths=(2, 2, 2, 2),
                   decoder_hidden=256)

    @classmethod
    def tiny(cls) -> "SegformerConfig":
        return cls(hidden_sizes=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                   num_heads=(1, 2, 2, 4), decoder_hidden=16, num_labels=5)


class _EfficientAttention(nn.Module):
    dim: int
    heads: int
    sr: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        b, n, c = x.shape
        q = nn.Dense(c, dtype=self.dtype, name="query")(x)
        kv_in = x
        if self.sr > 1:
            g = x.reshape(b, h, w, c)
            g = nn.Conv(c, (self.sr, self.sr), strides=(self.sr, self.sr),
                        dtype=self.dtype, name="sr")(g)
            kv_in = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="sr_norm")(
                g.reshape(b, -1, c))
        k = nn.Dense(c, dtype=self.dtype, name="key")(kv_in)
        v = nn.Dense(c, dtype=self.dtype, name="value")(kv_in)
        d = c // self.heads
        q = q.reshape(b, n, self.heads, d)
        k = k.reshape(b, -1, self.heads, d)
        v = v.reshape(b, -1, self.heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="out")(out)


class _MixFFN(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        b, n, c = x.shape
        y = nn.Dense(self.hidden, dtype=self.dtype, name="dense1")(x)
        g = y.reshape(b, h, w, self.hidden)
        g = nn.Conv(self.hidden, (3, 3), padding=1, feature_group_count=self.hidden,
                    dtype=self.dtype, name="dwconv")(g)
        y = nn.gelu(g.reshape(b, n, self.hidden), approximate=False)
        return nn.Dense(c, dtype=self.dtype, name="dense2")(y)


class SegformerForSemanticSegmentation(nn.Module):
    """pixels (B, H, W, 3) normalized -> logits (B, H/4, W/4, num_labels)."""

    cfg: SegformerConfig = SegformerConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = pixels
        feats = []
        for i in range(4):
            p, s = cfg.patch_sizes[i], cfg.strides[i]
            x = nn.Conv(cfg.hidden_sizes[i], (p, p), strides=(s, s), padding=p // 2,
                        dtype=self.dtype, name=f"patch_embed_{i}")(x)
            b, h, w, c = x.shape
            x = nn.LayerNorm(epsilon=cfg.eps, dtype=self.dtype,
                             name=f"patch_norm_{i}")(x.reshape(b, h * w, c))
            for j in range(cfg.depths[i]):
                res = x
                y = nn.LayerNorm(epsilon=cfg.eps, dtype=self.dtype,
                                 name=f"block_{i}_{j}_norm1")(x)
                x = res + _EfficientAttention(c, cfg.num_heads[i], cfg.sr_ratios[i],
                                              cfg.eps, self.dtype,
                                              name=f"block_{i}_{j}_attn")(y, h, w)
                res = x
                y = nn.LayerNorm(epsilon=cfg.eps, dtype=self.dtype,
                                 name=f"block_{i}_{j}_norm2")(x)
                x = res + _MixFFN(c, c * cfg.mlp_ratio, self.dtype,
                                  name=f"block_{i}_{j}_mlp")(y, h, w)
            x = nn.LayerNorm(epsilon=cfg.eps, dtype=self.dtype, name=f"stage_norm_{i}")(x)
            feats.append(x.reshape(b, h, w, c))
            x = feats[-1]

        # all-MLP decode head at the 1/4 grid
        th, tw = feats[0].shape[1:3]
        fused = []
        for i, f in enumerate(feats):
            b, h, w, c = f.shape
            y = nn.Dense(cfg.decoder_hidden, dtype=self.dtype,
                         name=f"linear_c_{i}")(f.reshape(b, h * w, c))
            y = y.reshape(b, h, w, cfg.decoder_hidden)
            if (h, w) != (th, tw):
                y = jax.image.resize(y, (b, th, tw, cfg.decoder_hidden), "bilinear")
            fused.append(y)
        y = jnp.concatenate(fused[::-1], axis=-1)  # HF concatenates c4..c1
        y = nn.Conv(cfg.decoder_hidden, (1, 1), use_bias=False, dtype=self.dtype,
                    name="linear_fuse")(y)
        scale = self.param("bn_scale", nn.initializers.ones, (cfg.decoder_hidden,))
        bias = self.param("bn_bias", nn.initializers.zeros, (cfg.decoder_hidden,))
        mean = self.param("bn_mean", nn.initializers.zeros, (cfg.decoder_hidden,))
        var = self.param("bn_var", nn.initializers.ones, (cfg.decoder_hidden,))
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        y = nn.relu(y * inv + (bias - mean * inv))
        return nn.Conv(cfg.num_labels, (1, 1), dtype=self.dtype, name="classifier")(y)


# ------------------------------------------------------------------ porting
def segformer_key_map(key: str):
    """HF ``SegformerForSemanticSegmentation`` state dict -> our paths."""
    import re

    k = key
    m = re.match(r"^segformer\.encoder\.patch_embeddings\.(\d)\.proj\.(weight|bias)$", k)
    if m:
        return f"patch_embed_{m.group(1)}.{m.group(2)}"
    m = re.match(r"^segformer\.encoder\.patch_embeddings\.(\d)\.layer_norm\.(weight|bias)$", k)
    if m:
        return f"patch_norm_{m.group(1)}.{m.group(2)}"
    m = re.match(r"^segformer\.encoder\.block\.(\d)\.(\d+)\.(.*)$", k)
    if m:
        i, j, rest = m.groups()
        rest = rest.replace("layer_norm_1.", "norm1.").replace("layer_norm_2.", "norm2.")
        rest = rest.replace("attention.self.layer_norm.", "attn.sr_norm.")
        rest = rest.replace("attention.self.", "attn.")
        rest = rest.replace("attention.output.dense.", "attn.out.")
        rest = rest.replace("mlp.dwconv.dwconv.", "mlp.dwconv.")
        return f"block_{i}_{j}_" + rest
    m = re.match(r"^segformer\.encoder\.layer_norm\.(\d)\.(weight|bias)$", k)
    if m:
        return f"stage_norm_{m.group(1)}.{m.group(2)}"
    m = re.match(r"^decode_head\.linear_c\.(\d)\.proj\.(weight|bias)$", k)
    if m:
        return f"linear_c_{m.group(1)}.{m.group(2)}"
    if k == "decode_head.linear_fuse.weight":
        return "linear_fuse.weight"
    m = re.match(r"^decode_head\.batch_norm\.(weight|bias|running_mean|running_var)$", k)
    if m:
        return "bn_" + {"weight": "scale", "bias": "bias", "running_mean": "mean",
                        "running_var": "var"}[m.group(1)]
    if "num_batches_tracked" in k:
        return None
    m = re.match(r"^decode_head\.classifier\.(weight|bias)$", k)
    if m:
        return f"classifier.{m.group(1)}"
    return k


def port_segformer(state_dict, template, strict: bool = True):
    from lkgd_tpu.utils.porting import port_state_dict

    return port_state_dict(state_dict, template, key_map=segformer_key_map,
                           strict=strict)


# ------------------------------------------------------------------ annotator
ADE20K_PALETTE_SEED = 20  # deterministic label->color map (annotator output is an image)


def ade_palette(num_labels: int = 150) -> np.ndarray:
    rng = np.random.default_rng(ADE20K_PALETTE_SEED)
    return rng.integers(0, 256, size=(num_labels, 3)).astype(np.uint8)


def normalize_pixels(images01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> ImageNet-normalized (HF SegformerImageProcessor defaults)."""
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    return (images01 - mean) / std


def make_segmentation_processor(params, cfg: SegformerConfig, dtype=jnp.float32):
    """Returns an (H, W, 3) uint8 -> (H, W, 3) uint8 colorized-segmentation processor for
    the control_preprocess registry (the map ControlNet seg conditioning consumes)."""
    model = SegformerForSemanticSegmentation(cfg, dtype=dtype)
    palette = ade_palette(cfg.num_labels)

    @jax.jit
    def _run(img):
        x = normalize_pixels(img[None])
        logits = model.apply(params, x.astype(dtype))
        return jnp.argmax(logits[0], axis=-1)

    def processor(image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        # pad to /32 so all stages divide evenly
        ph, pw = -h % 32, -w % 32
        img = np.pad(image.astype(np.float32) / 255.0, ((0, ph), (0, pw), (0, 0)))
        labels = np.asarray(_run(jnp.asarray(img)))
        seg = palette[labels]  # (h/4, w/4, 3)
        seg = np.asarray(jax.image.resize(jnp.asarray(seg, jnp.float32),
                                          (h + ph, w + pw, 3), "nearest"))
        return seg[:h, :w].astype(np.uint8)

    return processor
