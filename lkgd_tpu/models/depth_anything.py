"""Depth-Anything (DINOv2 ViT + DPT neck/head) — the model-based depth annotator.

The reference uses Depth-Anything twice: as the `depth` ControlNet preprocessor
(`/root/reference/utils/controlnet_utils.py:138` via controlnet_aux) / pseudo-label
annotator (`annotate/annotate_segmentation.py`, `annotate/configs/annotate_spatial.yaml`),
and as the pseudo-ground-truth for the depth metrics
(`gradios/compute_metrics.py:98-119`, `eval_depth.ipynb`). Checkpoint weights are
external; this module provides the TPU-native architecture + a porter keyed to the exact
HF ``DepthAnythingForDepthEstimation`` state-dict naming, so
``port_depth_anything(state_dict)`` drops real weights straight in.

Architecture (HF depth_anything, "small" defaults):
  * DINOv2 ViT-S/14 backbone: conv patch embed, cls token, learned pos-emb (statically
    interpolated to the configured input size), pre-norm blocks with LayerScale.
  * 4 intermediate-layer taps -> DPT reassemble (1x1 proj to pyramid widths + 4x/2x/1x/
    0.5x resize) -> 3x3 convs to the fusion width.
  * Top-down fusion with pre-activation residual blocks, bilinear 2x upsamples.
  * Head: conv -> upsample to pixel resolution -> conv/ReLU/conv/ReLU -> relative depth.

Everything is channels-last; convs/matmuls are XLA-native (MXU-friendly static shapes).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lkgd_tpu.models.layers import LayerNorm
from lkgd_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    image_size: int = 518  # must be a multiple of patch_size
    patch_size: int = 14
    hidden_size: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    out_indices: Tuple[int, ...] = (8, 9, 10, 11)  # last 4 layers (HF stages 9..12)
    neck_hidden_sizes: Tuple[int, ...] = (48, 96, 192, 384)
    fusion_hidden_size: int = 64
    head_hidden_size: int = 32
    layer_norm_eps: float = 1e-6

    @classmethod
    def small(cls) -> "DepthAnythingConfig":
        return cls()

    @classmethod
    def base(cls) -> "DepthAnythingConfig":
        return cls(hidden_size=768, num_heads=12, neck_hidden_sizes=(96, 192, 384, 768),
                   fusion_hidden_size=128)

    @classmethod
    def tiny(cls) -> "DepthAnythingConfig":
        return cls(image_size=28, patch_size=14, hidden_size=32, depth=4, num_heads=2,
                   out_indices=(0, 1, 2, 3), neck_hidden_sizes=(8, 8, 16, 16),
                   fusion_hidden_size=16, head_hidden_size=8)


class Dinov2Layer(nn.Module):
    """Pre-norm ViT block with LayerScale (DINOv2): separate q/k/v projections with bias
    (HF ``Dinov2SelfAttention``), GELU MLP."""

    config: DepthAnythingConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        d = cfg.hidden_size
        hd = d // cfg.num_heads
        b, s = x.shape[:2]
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="norm1")(x)
        q = nn.Dense(d, dtype=self.dtype, name="q")(h).reshape(b, s, cfg.num_heads, hd)
        k = nn.Dense(d, dtype=self.dtype, name="k")(h).reshape(b, s, cfg.num_heads, hd)
        v = nn.Dense(d, dtype=self.dtype, name="v")(h).reshape(b, s, cfg.num_heads, hd)
        o = dot_product_attention(q, k, v).reshape(b, s, d)
        o = nn.Dense(d, dtype=self.dtype, name="proj")(o)
        ls1 = self.param("layer_scale1", nn.initializers.ones, (d,))
        x = x + o * ls1.astype(self.dtype)
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(d * cfg.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(nn.gelu(h, approximate=False))
        ls2 = self.param("layer_scale2", nn.initializers.ones, (d,))
        return x + h * ls2.astype(self.dtype)


def _ac_matrix(out: int, inp: int):
    """(out, inp) bilinear interpolation matrix with align_corners=True grid."""
    import numpy as np

    if out == 1 or inp == 1:
        return np.full((out, inp), 1.0 / inp, np.float32)
    src = np.arange(out) * (inp - 1) / (out - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, inp - 2)
    t = (src - i0).astype(np.float32)
    m = np.zeros((out, inp), np.float32)
    m[np.arange(out), i0] = 1 - t
    m[np.arange(out), i0 + 1] = t
    return m


def _resize_align_corners(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H, W, C) bilinear resize matching torch ``align_corners=True`` (the DPT/
    Depth-Anything fusion + head convention) as two static interpolation matmuls."""
    ah = jnp.asarray(_ac_matrix(h, x.shape[1]), x.dtype)
    aw = jnp.asarray(_ac_matrix(w, x.shape[2]), x.dtype)
    return jnp.einsum("oh,bhwc,pw->bopc", ah, x, aw)


class PreActResidualLayer(nn.Module):
    """ReLU->conv->ReLU->conv residual unit (HF ``DPTPreActResidualLayer``)."""

    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="convolution1")(
            nn.relu(x))
        h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="convolution2")(
            nn.relu(h))
        return x + h


class DepthAnything(nn.Module):
    """(B, H, W, 3) ImageNet-normalized pixels -> (B, H, W) relative depth (>= 0)."""

    config: DepthAnythingConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, H, W, _ = pixel_values.shape
        ph, pw = H // cfg.patch_size, W // cfg.patch_size

        # ---- DINOv2 backbone
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), dtype=self.dtype,
                    name="patch_embed")(pixel_values.astype(self.dtype))
        x = x.reshape(b, ph * pw, cfg.hidden_size)
        cls_tok = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size))
        # stored pos-emb is for the native (image_size/patch)^2 grid + cls; interpolate
        # statically to this input's grid (HF interpolate_pos_encoding)
        n_native = (cfg.image_size // cfg.patch_size) ** 2
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (1, n_native + 1, cfg.hidden_size))
        g = cfg.image_size // cfg.patch_size
        patch_pos = pos[:, 1:].reshape(1, g, g, cfg.hidden_size)
        if (ph, pw) != (g, g):
            # HF Dinov2 interpolate_pos_encoding: torch BICUBIC (a=-0.75),
            # align_corners=False, no antialias. jax.image.resize("cubic") is the Keys
            # a=-0.5 kernel and does NOT match; ops/resize.bicubic_resize does.
            from lkgd_tpu.ops.resize import bicubic_resize

            patch_pos = bicubic_resize(patch_pos, (ph, pw))
        x = x + patch_pos.reshape(1, ph * pw, cfg.hidden_size).astype(self.dtype)
        cls = jnp.broadcast_to(cls_tok.astype(self.dtype) + pos[:, :1].astype(self.dtype),
                               (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)

        taps = {}
        for i in range(cfg.depth):
            x = Dinov2Layer(cfg, dtype=self.dtype, name=f"layer_{i}")(x)
            if i in cfg.out_indices:
                taps[i] = x
        # Dinov2Backbone applies the shared final layernorm to every tapped state
        # (apply_layernorm=True), then drops cls for the dense neck
        backbone_norm = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="backbone_norm")
        taps = {i: backbone_norm(t)[:, 1:] for i, t in taps.items()}

        # ---- DPT reassemble: 1x1 proj to pyramid widths, then 4x/2x/1x/0.5x resize
        feats = []
        for j, i in enumerate(cfg.out_indices):
            f = taps[i].reshape(b, ph, pw, cfg.hidden_size)
            f = nn.Conv(cfg.neck_hidden_sizes[j], (1, 1), dtype=self.dtype,
                        name=f"reassemble_{j}_projection")(f)
            if j == 0:
                f = nn.ConvTranspose(cfg.neck_hidden_sizes[j], (4, 4), strides=(4, 4),
                                     dtype=self.dtype, name="reassemble_0_resize")(f)
            elif j == 1:
                f = nn.ConvTranspose(cfg.neck_hidden_sizes[j], (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="reassemble_1_resize")(f)
            elif j == 3:
                f = nn.Conv(cfg.neck_hidden_sizes[j], (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="reassemble_3_resize")(f)
            f = nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"neck_convs_{j}")(f)
            feats.append(f)

        # ---- top-down fusion (deepest first): fused += res1(skip); res2; upsample to the
        # next level's size (align_corners=True, DPT convention); 1x1 projection
        fused = None
        for j in (3, 2, 1, 0):
            f = feats[j]
            if fused is None:
                fused = f
            else:
                fused = fused + PreActResidualLayer(cfg.fusion_hidden_size, dtype=self.dtype,
                                                    name=f"fusion_{j}_res1")(f)
            fused = PreActResidualLayer(cfg.fusion_hidden_size, dtype=self.dtype,
                                        name=f"fusion_{j}_res2")(fused)
            if j > 0:
                nh, nw = feats[j - 1].shape[1], feats[j - 1].shape[2]
            else:
                nh, nw = fused.shape[1] * 2, fused.shape[2] * 2
            fused = _resize_align_corners(fused, nh, nw)
            fused = nn.Conv(cfg.fusion_hidden_size, (1, 1), dtype=self.dtype,
                            name=f"fusion_{j}_projection")(fused)

        # ---- depth head
        h = nn.Conv(cfg.fusion_hidden_size // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="head_conv1")(fused)
        h = _resize_align_corners(h, H, W)
        h = nn.Conv(cfg.head_hidden_size, (3, 3), padding=1, dtype=self.dtype,
                    name="head_conv2")(h)
        h = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(nn.relu(h))
        return nn.relu(h)[..., 0]


# --------------------------------------------------------------------------- porting
_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_pixels(images01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> ImageNet-normalized (the HF image processor's normalization)."""
    return (images01 - _IMAGENET_MEAN) / _IMAGENET_STD


def hf_depth_anything_key_map(cfg: DepthAnythingConfig):
    """{HF DepthAnythingForDepthEstimation state-dict key -> (flax path, transpose)}.

    transpose: 'dense' (torch (out,in) -> (in,out)), 'conv' (OIHW -> HWIO),
    'convT' (IOHW -> HWOI for ConvTranspose), None (verbatim).
    """
    m = {}
    pre = "backbone.embeddings"
    m[f"{pre}.cls_token"] = (("params", "cls_token"), None)
    m[f"{pre}.position_embeddings"] = (("params", "position_embeddings"), None)
    m[f"{pre}.patch_embeddings.projection.weight"] = (("params", "patch_embed", "kernel"), "conv")
    m[f"{pre}.patch_embeddings.projection.bias"] = (("params", "patch_embed", "bias"), None)
    for i in range(cfg.depth):
        hf = f"backbone.encoder.layer.{i}"
        fx = f"layer_{i}"
        for a, b in (("attention.attention.query", "q"), ("attention.attention.key", "k"),
                     ("attention.attention.value", "v"), ("attention.output.dense", "proj"),
                     ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2")):
            m[f"{hf}.{a}.weight"] = (("params", fx, b, "kernel"), "dense")
            m[f"{hf}.{a}.bias"] = (("params", fx, b, "bias"), None)
        for a, b in (("norm1", "norm1"), ("norm2", "norm2")):
            m[f"{hf}.{a}.weight"] = (("params", fx, b, "scale"), None)
            m[f"{hf}.{a}.bias"] = (("params", fx, b, "bias"), None)
        m[f"{hf}.layer_scale1.lambda1"] = (("params", fx, "layer_scale1"), None)
        m[f"{hf}.layer_scale2.lambda1"] = (("params", fx, "layer_scale2"), None)
    m["backbone.layernorm.weight"] = (("params", "backbone_norm", "scale"), None)
    m["backbone.layernorm.bias"] = (("params", "backbone_norm", "bias"), None)
    for j in range(4):
        hf = f"neck.reassemble_stage.layers.{j}"
        m[f"{hf}.projection.weight"] = (("params", f"reassemble_{j}_projection", "kernel"), "conv")
        m[f"{hf}.projection.bias"] = (("params", f"reassemble_{j}_projection", "bias"), None)
        if j in (0, 1):
            m[f"{hf}.resize.weight"] = (("params", f"reassemble_{j}_resize", "kernel"), "convT")
            m[f"{hf}.resize.bias"] = (("params", f"reassemble_{j}_resize", "bias"), None)
        elif j == 3:
            m[f"{hf}.resize.weight"] = (("params", f"reassemble_{j}_resize", "kernel"), "conv")
            m[f"{hf}.resize.bias"] = (("params", f"reassemble_{j}_resize", "bias"), None)
        m[f"neck.convs.{j}.weight"] = (("params", f"neck_convs_{j}", "kernel"), "conv")
        hf = f"neck.fusion_stage.layers.{3 - j}"  # HF lists fusion layers deepest-first
        m[f"{hf}.projection.weight"] = (("params", f"fusion_{j}_projection", "kernel"), "conv")
        m[f"{hf}.projection.bias"] = (("params", f"fusion_{j}_projection", "bias"), None)
        for a, b in (("residual_layer1", "res1"), ("residual_layer2", "res2")):
            for c in ("convolution1", "convolution2"):
                if j == 3 and a == "residual_layer1":
                    continue  # deepest fusion layer has no incoming residual
                m[f"{hf}.{a}.{c}.weight"] = (("params", f"fusion_{j}_{b}", c, "kernel"), "conv")
                m[f"{hf}.{a}.{c}.bias"] = (("params", f"fusion_{j}_{b}", c, "bias"), None)
    for a, b in (("head.conv1", "head_conv1"), ("head.conv2", "head_conv2"),
                 ("head.conv3", "head_conv3")):
        m[f"{a}.weight"] = (("params", b, "kernel"), "conv")
        m[f"{a}.bias"] = (("params", b, "bias"), None)
    return m


def port_depth_anything(state_dict, cfg: DepthAnythingConfig):
    """HF DepthAnythingForDepthEstimation state dict (numpy arrays) -> flax variables."""
    import numpy as np

    key_map = hf_depth_anything_key_map(cfg)
    out = {}
    for hf_key, (path, kind) in key_map.items():
        w = np.asarray(state_dict[hf_key])
        if kind == "dense":
            w = w.T
        elif kind == "conv":
            w = w.transpose(2, 3, 1, 0)
        elif kind == "convT":
            w = w.transpose(2, 3, 0, 1)  # torch ConvTranspose (in,out,kh,kw) -> (kh,kw,in,out)
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(w)
    return out


def load_state_dict(path: str):
    """Back-compat alias for :func:`lkgd_tpu.utils.porting.load_state_dict`."""
    from lkgd_tpu.utils.porting import load_state_dict as _load

    return _load(path)


def make_depth_processor(params, cfg: DepthAnythingConfig, dtype=jnp.float32):
    """Returns an (H, W, 3) [0,1] -> (H, W, 3) [0,1] depth-map callable for the
    control_preprocess registry (reference `utils/controlnet_utils.py:138` midas/zoe)."""
    import numpy as np

    model = DepthAnything(cfg, dtype=dtype)
    size = cfg.image_size

    import jax as _jax

    @_jax.jit
    def _run(img):
        d = model.apply(params, normalize_pixels(img)[None])[0]
        lo, hi = jnp.min(d), jnp.max(d)
        return (d - lo) / (hi - lo + 1e-8)

    def processor(image: "np.ndarray") -> "np.ndarray":
        h, w = image.shape[:2]
        img = jax.image.resize(jnp.asarray(image, jnp.float32), (size, size, 3), "bilinear")
        d = _run(img)
        d = jax.image.resize(d, (h, w), "bilinear")
        return np.repeat(np.asarray(d, np.float32)[..., None], 3, axis=-1)

    return processor
