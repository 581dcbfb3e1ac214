"""MiDaS DPT-hybrid depth estimator, TPU-native — the reference's depth annotator.

The reference's ``depth`` ControlNet preprocessor
(`/root/reference/utils/controlnet_utils.py:104-106,136` via
``controlnet_aux.MidasDetector``) runs isl-org MiDaS ``DPTDepthModel`` with the
``vitb_rn50_384`` (DPT-hybrid) backbone — checkpoint ``dpt_hybrid-midas-501f0c75.pt``.
This module implements the full architecture + porter keyed to the exact isl-org/timm
state-dict naming, closing the round-2 "midas depth substituted by Depth-Anything" gap:

  * timm ``ResNetV2`` hybrid stem (weight-standardized convs, GroupNorm(32)+ReLU,
    TF-SAME padding, non-preact bottlenecks — the checkpoint's ``downsample.norm.*``
    keys exist only in the non-preact variant, so a structural mismatch fails the
    strict porter instead of silently diverging)
  * ViT-B/16 encoder over the backbone's /16 feature map (patch_embed.proj 1x1,
    cls token, 577-token pos_embed at the native 384x384 input)
  * DPT neck: hooks at resnet stage 1 (/4, 256ch), stage 2 (/8, 512ch) and ViT blocks
    8 and 11 with 'project' readout (cat cls -> Linear(1536, 768) -> GELU), reassembled
    to /16 and /32, 3x3 ``layerN_rn`` projections to 256, four RefineNet-style
    ``FeatureFusionBlock_custom`` stages with bilinear align-corners x2 upsampling
  * monocular head: 3x3 -> x2 up -> 3x3 -> ReLU -> 1x1 -> ReLU (non-negative depth)

TPU notes: channels-last NHWC; weight standardization runs on the fp32 kernels at call
time (folds into XLA constants for frozen inference); the (B, 577, 768) ViT stack is
plain attention (S is tiny next to the video models); align-corners bilinear resize via
jax.image with explicit scale handling.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MidasConfig:
    image_size: int = 384
    resnet_layers: Tuple[int, ...] = (3, 4, 9)
    stem_width: int = 64
    vit_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    vit_mlp_ratio: int = 4
    hooks: Tuple[int, ...] = (8, 11)  # ViT blocks feeding the neck
    features: int = 256  # scratch width
    neck_channels: Tuple[int, ...] = (256, 512, 768, 768)

    @classmethod
    def tiny(cls) -> "MidasConfig":
        return cls(image_size=64, resnet_layers=(1, 1, 1), stem_width=8, vit_dim=32,
                   vit_depth=2, vit_heads=2, hooks=(0, 1), features=16,
                   neck_channels=(32, 64, 32, 32))


# ------------------------------------------------------------------ primitives
def _std_kernel(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """timm StdConv2d weight standardization: per-OUTPUT-channel zero-mean/unit-var of
    the (kh, kw, in) fan-in (kernel layout HWIO; torch normalizes over (in, kh, kw))."""
    wf = w.astype(jnp.float32)
    mu = jnp.mean(wf, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(wf, axis=(0, 1, 2), keepdims=True)
    return ((wf - mu) * jax.lax.rsqrt(var + eps)).astype(w.dtype)


class StdConv(nn.Module):
    """Weight-standardized conv with TF-SAME padding (timm StdConv2dSame)."""

    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, x.shape[-1], self.features))
        return jax.lax.conv_general_dilated(
            x, _std_kernel(w).astype(self.dtype), (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class GroupNormAct(nn.Module):
    """timm GroupNormAct: GroupNorm(32) + optional ReLU."""

    apply_act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from lkgd_tpu.ops.group_norm import group_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        n = x.shape[0]
        m = int(np.prod(x.shape[1:-1]))
        y = group_norm(x.reshape(n, m, c), scale, bias,
                       num_groups=32 if c >= 32 else c, eps=1e-5)
        y = y.reshape(x.shape).astype(self.dtype)
        return nn.relu(y) if self.apply_act else y


def _maxpool_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 max pool, TF-SAME (timm MaxPool2dSame in the 'same' stem)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


class Bottleneck(nn.Module):
    """timm resnetv2 non-preact Bottleneck (conv1/norm1 -> conv2/norm2 -> conv3/norm3,
    ReLU after the residual add; 1x1+norm downsample shortcut)."""

    out_channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.out_channels // 4
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = StdConv(self.out_channels, 1, self.stride, dtype=self.dtype,
                               name="downsample_conv")(x)
            shortcut = GroupNormAct(apply_act=False, dtype=self.dtype,
                                    name="downsample_norm")(shortcut)
        h = GroupNormAct(dtype=self.dtype, name="norm1")(
            StdConv(mid, 1, dtype=self.dtype, name="conv1")(x))
        h = GroupNormAct(dtype=self.dtype, name="norm2")(
            StdConv(mid, 3, self.stride, dtype=self.dtype, name="conv2")(h))
        h = GroupNormAct(apply_act=False, dtype=self.dtype, name="norm3")(
            StdConv(self.out_channels, 1, dtype=self.dtype, name="conv3")(h))
        return nn.relu(h + shortcut)


class HybridBackbone(nn.Module):
    """ResNetV2 stem + 3 stages (timm vit_base_r50_s16 hybrid: layers (3, 4, 9));
    returns (stage0 /4, stage1 /8, stage2 /16) feature maps."""

    config: MidasConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cfg = self.config
        h = StdConv(cfg.stem_width, 7, 2, dtype=self.dtype, name="stem_conv")(x)
        h = GroupNormAct(dtype=self.dtype, name="stem_norm")(h)
        h = _maxpool_same(h)
        outs = []
        width = cfg.stem_width * 4
        for si, n_blocks in enumerate(cfg.resnet_layers):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = Bottleneck(width, stride, dtype=self.dtype,
                               name=f"stages_{si}_blocks_{bi}")(h)
            outs.append(h)
            width *= 2
        return outs


class VitBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, d = x.shape
        hd = d // self.heads
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, s, 3, self.heads, hd), 3, axis=2)
        q, k, v = (t[:, :, 0] for t in (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_ratio * d, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(d, dtype=self.dtype, name="fc2")(h)


def _resize_bilinear_ac(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear, align_corners=True (torch interpolate in the DPT fusion blocks):
    source coords = dst * (in-1)/(out-1)."""
    ih, iw = x.shape[1], x.shape[2]

    def coords(out, inp):
        if out == 1:
            return jnp.zeros((out,), jnp.float32)
        return jnp.arange(out, dtype=jnp.float32) * ((inp - 1) / (out - 1))

    yc, xc = coords(h, ih), coords(w, iw)
    y0 = jnp.clip(jnp.floor(yc).astype(jnp.int32), 0, ih - 1)
    y1 = jnp.clip(y0 + 1, 0, ih - 1)
    x0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, iw - 1)
    x1 = jnp.clip(x0 + 1, 0, iw - 1)
    wy = (yc - y0.astype(jnp.float32))[None, :, None, None].astype(x.dtype)
    wx = (xc - x0.astype(jnp.float32))[None, None, :, None].astype(x.dtype)
    g = lambda yi, xi: x[:, yi][:, :, xi]  # noqa: E731
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class ResidualConvUnit(nn.Module):
    """DPT ResidualConvUnit_custom (bn=False): relu->conv->relu->conv + x."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(nn.relu(x))
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(nn.relu(h))
        return h + x


class FeatureFusionBlock(nn.Module):
    """DPT FeatureFusionBlock_custom (deconv=False, bn=False, expand=False,
    align_corners=True)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="resConfUnit2")(x)
        x = _resize_bilinear_ac(x, 2 * x.shape[1], 2 * x.shape[2])
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DPTHybridDepth(nn.Module):
    """Full DPT-hybrid monocular depth model. Input (B, H, W, 3) normalized to
    mean/std 0.5 (i.e. 2*img-1); H=W=image_size. Returns (B, H, W) inverse depth."""

    config: MidasConfig = MidasConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = x.shape[0]
        gh = gw = cfg.image_size // 16

        s0, s1, s2 = HybridBackbone(cfg, dtype=self.dtype, name="backbone")(
            x.astype(self.dtype))

        # ViT over the /16 map
        tokens = nn.Conv(cfg.vit_dim, (1, 1), dtype=self.dtype,
                         name="patch_embed_proj")(s2)
        tokens = tokens.reshape(b, gh * gw, cfg.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.vit_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, cfg.vit_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.vit_dim)), tokens], 1)
        tokens = tokens + pos.astype(self.dtype)
        hook_outs = []
        for i in range(cfg.vit_depth):
            tokens = VitBlock(cfg.vit_dim, cfg.vit_heads, cfg.vit_mlp_ratio,
                              dtype=self.dtype, name=f"blocks_{i}")(tokens)
            if i in cfg.hooks:
                hook_outs.append(tokens)

        # readout 'project': cat cls onto every token, Linear 2d->d, GELU, to /16 map
        def project(t, idx):
            clsr = jnp.broadcast_to(t[:, :1], t[:, 1:].shape)
            h = jnp.concatenate([t[:, 1:], clsr], axis=-1)
            h = nn.Dense(cfg.vit_dim, dtype=self.dtype,
                         name=f"readout_{idx}_project")(h)
            return nn.gelu(h, approximate=False).reshape(b, gh, gw, cfg.vit_dim)

        l3 = project(hook_outs[0], 3)
        l3 = nn.Conv(cfg.neck_channels[2], (1, 1), dtype=self.dtype,
                     name="act_postprocess3_conv")(l3)
        l4 = project(hook_outs[1], 4)
        l4 = nn.Conv(cfg.neck_channels[3], (1, 1), dtype=self.dtype,
                     name="act_postprocess4_conv")(l4)
        l4 = nn.Conv(cfg.neck_channels[3], (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="act_postprocess4_down")(l4)

        f = cfg.features
        rn = lambda t, i, name: nn.Conv(f, (3, 3), padding=1, use_bias=False,  # noqa: E731
                                        dtype=self.dtype, name=name)(t)
        l1_rn = rn(s0, 0, "layer1_rn")
        l2_rn = rn(s1, 1, "layer2_rn")
        l3_rn = rn(l3, 2, "layer3_rn")
        l4_rn = rn(l4, 3, "layer4_rn")

        p4 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet4")(l4_rn)
        p3 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet3")(p4, l3_rn)
        p2 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet2")(p3, l2_rn)
        p1 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet1")(p2, l1_rn)

        h = nn.Conv(f // 2, (3, 3), padding=1, dtype=self.dtype, name="head_conv1")(p1)
        h = _resize_bilinear_ac(h, 2 * h.shape[1], 2 * h.shape[2])
        h = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="head_conv2")(h))
        h = nn.relu(nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(h))
        return h[..., 0]


# ------------------------------------------------------------------ porting
def midas_key_map(key: str):
    """isl-org MiDaS dpt_hybrid-midas state dict -> our paths (timm + DPT naming)."""
    import re

    k = key
    if k.startswith("pretrained.model."):
        k = k[len("pretrained.model."):]
        if k.startswith("patch_embed.backbone."):
            k = k[len("patch_embed.backbone."):]
            k = k.replace("stem.conv.weight", "backbone.stem_conv.kernel")
            k = k.replace("stem.norm.weight", "backbone.stem_norm.scale")
            k = k.replace("stem.norm.bias", "backbone.stem_norm.bias")
            m = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.*)", k)
            if m:
                si, bi, rest = m.groups()
                rest = rest.replace("downsample.conv.weight", "downsample_conv.kernel")
                rest = rest.replace("downsample.norm.weight", "downsample_norm.scale")
                rest = rest.replace("downsample.norm.bias", "downsample_norm.bias")
                rest = re.sub(r"conv(\d)\.weight", r"conv\1.kernel", rest)
                rest = re.sub(r"norm(\d)\.weight", r"norm\1.scale", rest)
                return f"backbone.stages_{si}_blocks_{bi}.{rest}"
            return k
        if k == "cls_token":
            return "cls_token"
        if k == "pos_embed":
            return "pos_embed"
        if k.startswith("patch_embed.proj."):
            return k.replace("patch_embed.proj.", "patch_embed_proj.").replace(
                ".weight", ".kernel")
        m = __import__("re").match(r"blocks\.(\d+)\.(.*)", k)
        if m:
            bi, rest = m.groups()
            rest = rest.replace("attn.qkv.", "qkv.").replace("attn.proj.", "proj.")
            rest = rest.replace("mlp.fc1.", "fc1.").replace("mlp.fc2.", "fc2.")
            rest = rest.replace("norm1.weight", "norm1.scale")
            rest = rest.replace("norm2.weight", "norm2.scale")
            if rest.endswith(".weight"):
                rest = rest[:-len(".weight")] + ".kernel"
            return f"blocks_{bi}.{rest}"
        if k.startswith("norm."):
            return None  # final encoder norm: unused by the DPT hooks
        return k
    if k.startswith("pretrained.act_postprocess"):
        n = k[len("pretrained.act_postprocess")]
        rest = k.split(".", 1)[1]  # actpostprocessN.<idx>...
        idx_rest = rest.split(".", 1)[1]
        if idx_rest.startswith("0.project.0."):
            leaf = "kernel" if idx_rest.endswith("weight") else "bias"
            return f"readout_{n}_project.{leaf}"
        if idx_rest.startswith("3."):
            leaf = "kernel" if idx_rest.endswith("weight") else "bias"
            return f"act_postprocess{n}_conv.{leaf}"
        if idx_rest.startswith("4."):
            leaf = "kernel" if idx_rest.endswith("weight") else "bias"
            return f"act_postprocess{n}_down.{leaf}"
        return None
    if k.startswith("scratch."):
        k = k[len("scratch."):]
        if k.startswith("refinenet4.resConfUnit1."):
            # dead weights: isl-org constructs resConfUnit1 in every fusion block but
            # refinenet4 is always called without a skip input, so these never execute
            # (dpt_depth.py forward: path_4 = refinenet4(layer_4_rn) only)
            return None
        m = __import__("re").match(r"layer(\d)_rn\.weight", k)
        if m:
            return f"layer{m.group(1)}_rn.kernel"
        m = __import__("re").match(r"refinenet(\d)\.(.*)", k)
        if m:
            n, rest = m.groups()
            rest = rest.replace("resConfUnit", "resConfUnit")
            rest = re.sub(r"conv(\d)\.weight", r"conv\1.kernel", rest)
            rest = rest.replace("out_conv.weight", "out_conv.kernel")
            return f"refinenet{n}.{rest}"
        m = __import__("re").match(r"output_conv\.(\d)\.(weight|bias)", k)
        if m:
            idx, leaf = m.groups()
            name = {"0": "head_conv1", "2": "head_conv2", "4": "head_conv3"}[idx]
            return f"{name}.{'kernel' if leaf == 'weight' else leaf}"
    return k


def port_midas(state_dict, template, strict: bool = True):
    """dpt_hybrid-midas-501f0c75.pt -> DPTHybridDepth params (strict key coverage)."""
    from lkgd_tpu.utils.porting import _fit_tensor

    leaves = {}
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    for path, leaf in flat:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        leaves[keys] = (tuple(leaf.shape), leaf.dtype)

    produced, unused = {}, []
    for key, tensor in state_dict.items():
        mapped = midas_key_map(key)
        if mapped is None:
            continue
        path = ("params",) + tuple(mapped.split("."))
        if path not in leaves:
            unused.append(key)
            continue
        fitted = _fit_tensor(np.asarray(tensor), leaves[path][0],
                             is_kernel=(path[-1] == "kernel"))
        if fitted is None:
            raise ValueError(f"{key}: shape {np.shape(tensor)} !-> {leaves[path][0]}")
        produced[path] = fitted.astype(leaves[path][1])
    missing = [p for p in leaves if p not in produced]
    if strict and (missing or unused):
        raise ValueError(f"midas port: missing {len(missing)} "
                         f"(e.g. {['/'.join(p) for p in missing[:4]]}), "
                         f"unused {len(unused)} (e.g. {unused[:4]})")
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    return jax.tree_util.tree_unflatten(
        treedef, [produced.get(tuple(str(getattr(p, 'key', p)) for p in path),
                               np.asarray(leaf)) for path, leaf in flat])


def make_midas_processor(checkpoint_path: str, cfg: Optional[MidasConfig] = None):
    """control_preprocess-registerable depth callable (controlnet_aux MidasDetector:
    resize to 384, normalize (x-0.5)/0.5, run, min-max normalize the inverse depth)."""
    from lkgd_tpu.utils.porting import load_state_dict

    cfg = cfg or MidasConfig()
    model = DPTHybridDepth(cfg)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    params = port_midas(load_state_dict(checkpoint_path), template)
    fn = jax.jit(lambda img: model.apply(params, img))

    def process(image: np.ndarray) -> np.ndarray:
        import cv2

        h, w = image.shape[:2]
        inp = cv2.resize(image, (cfg.image_size, cfg.image_size),
                         interpolation=cv2.INTER_CUBIC)
        depth = np.asarray(fn(jnp.asarray((inp[None] - 0.5) / 0.5, jnp.float32)))[0]
        depth = (depth - depth.min()) / (depth.max() - depth.min() + 1e-8)
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_LINEAR)
        return np.repeat(depth[..., None], 3, axis=-1).astype(np.float32)

    return process
