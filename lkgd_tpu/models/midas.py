"""DPT depth estimators (DPT-large + DPT-hybrid), TPU-native — the reference's depth
annotator family.

The reference's ``depth`` ControlNet preprocessor
(`/root/reference/utils/controlnet_utils.py:103-117`) runs
``transformers.pipeline('depth-estimation')`` — whose DEFAULT model is **Intel/dpt-large**
(pure ViT-L/16 DPT). ``DPTLargeDepth`` + ``port_dpt_large`` below implement that exact
path, keyed to the HF ``DPTForDepthEstimation`` state-dict naming, with
``make_depth_processor`` replicating the pipeline's square-384 resize / mean-std-0.5
normalize / bicubic-upsample / max-normalize chain.

``DPTHybridDepth`` (further below) is the isl-org MiDaS ``dpt_hybrid-midas-501f0c75.pt``
variant (``vitb_rn50_384`` backbone) that ``controlnet_aux.MidasDetector`` runs — kept
for the ``depth_midas`` processor id (used by other ControlNet tooling), ported from the
exact isl-org/timm state-dict naming:

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
    patch_size: int = 16  # DPT-large image patchification (hybrid patches the /16 map)
    vit_ln_eps: float = 1e-6  # timm ViT; HF DPTConfig uses 1e-12

    @classmethod
    def tiny(cls) -> "MidasConfig":
        return cls(image_size=64, resnet_layers=(1, 1, 1), stem_width=8, vit_dim=32,
                   vit_depth=2, vit_heads=2, hooks=(0, 1), features=16,
                   neck_channels=(32, 64, 32, 32))

    @classmethod
    def large(cls) -> "MidasConfig":
        """Intel/dpt-large (the transformers depth-estimation pipeline default):
        ViT-L/16, hooks after encoder layers (5, 11, 17, 23), reassemble channels
        (256, 512, 1024, 1024), fusion width 256."""
        return cls(image_size=384, vit_dim=1024, vit_depth=24, vit_heads=16,
                   hooks=(5, 11, 17, 23), features=256,
                   neck_channels=(256, 512, 1024, 1024), vit_ln_eps=1e-12)

    @classmethod
    def tiny_large(cls) -> "MidasConfig":
        return cls(image_size=64, vit_dim=32, vit_depth=4, vit_heads=2,
                   hooks=(0, 1, 2, 3), features=16, neck_channels=(8, 16, 32, 32),
                   vit_ln_eps=1e-12)


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
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, d = x.shape
        hd = d // self.heads
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, s, 3, self.heads, hd), 3, axis=2)
        q, k, v = (t[:, :, 0] for t in (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="proj")(o)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm2")(x)
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


def resize_pos_embed(pos: jnp.ndarray, grid_hw: Tuple[int, int],
                     num_prefix: int = 1) -> jnp.ndarray:
    """MiDaS ``_resize_pos_embed`` (isl-org vit.py forward_flex): keep the prefix
    (cls) tokens, bilinearly resample the square grid part to ``grid_hw``
    (F.interpolate mode='bilinear', align_corners=False == jax.image 'linear')."""
    tok, grid = pos[:, :num_prefix], pos[0, num_prefix:]
    gs_old = int(round(float(np.sqrt(grid.shape[0]))))
    grid = grid.reshape(gs_old, gs_old, -1)
    grid = jax.image.resize(grid.astype(jnp.float32),
                            (grid_hw[0], grid_hw[1], grid.shape[-1]), method="linear",
                            antialias=False)  # F.interpolate(bilinear) never antialiases
    grid = grid.reshape(1, grid_hw[0] * grid_hw[1], -1).astype(pos.dtype)
    return jnp.concatenate([tok, grid], axis=1)


class DPTHybridDepth(nn.Module):
    """Full DPT-hybrid monocular depth model. Input (B, H, W, 3) normalized to
    mean/std 0.5 (i.e. 2*img-1); H, W any multiple of 32 (non-native grids get the
    MiDaS forward_flex pos-embed bilinear resample). Returns (B, H, W) inverse depth."""

    config: MidasConfig = MidasConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = x.shape[0]
        gh, gw = x.shape[1] // 16, x.shape[2] // 16
        native = cfg.image_size // 16

        s0, s1, s2 = HybridBackbone(cfg, dtype=self.dtype, name="backbone")(
            x.astype(self.dtype))

        # ViT over the /16 map
        tokens = nn.Conv(cfg.vit_dim, (1, 1), dtype=self.dtype,
                         name="patch_embed_proj")(s2)
        tokens = tokens.reshape(b, gh * gw, cfg.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.vit_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, native * native + 1, cfg.vit_dim))
        if (gh, gw) != (native, native):
            pos = resize_pos_embed(pos, (gh, gw))
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


class BlockUpsample(nn.Module):
    """Non-overlapping ConvTranspose2d(k=stride=s) as an einsum block expansion —
    exactly torch's transposed conv when kernel == stride (every output pixel receives
    one tap), MXU-lowered, no lax.conv_transpose kernel-orientation ambiguity.
    Param kernel layout (s, s, in, out) = torch weight.transpose(2, 3, 0, 1)."""

    features: int
    scale: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.scale
        b, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (s, s, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("bhwc,ijco->bhiwjo", x.astype(self.dtype),
                       kernel.astype(self.dtype))
        return y.reshape(b, h * s, w * s, self.features) + bias.astype(self.dtype)


class DPTLargeDepth(nn.Module):
    """HF ``DPTForDepthEstimation`` (Intel/dpt-large) — the model behind the reference's
    ``transformers.pipeline('depth-estimation')`` depth preprocessor
    (`/root/reference/utils/controlnet_utils.py:110`).

    Pure ViT-L/16 encoder, 'project' readout at 4 hook layers, reassemble to
    /4 (x4 transposed conv), /8 (x2), /16 (identity), /32 (stride-2 conv), 3x3
    no-bias neck convs to the fusion width, 4 pre-act residual fusion stages with
    align-corners x2 upsampling, monocular head. Input (B, H, W, 3) normalized to
    mean/std 0.5; H = W = config.image_size (the pipeline's square 384 resize —
    Intel/dpt-large ships keep_aspect_ratio=False). Returns (B, H, W) non-negative
    inverse depth."""

    config: MidasConfig = MidasConfig.large()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = x.shape[0]
        ps = cfg.patch_size
        gh = gw = cfg.image_size // ps

        tokens = nn.Conv(cfg.vit_dim, (ps, ps), strides=(ps, ps), padding="VALID",
                         dtype=self.dtype, name="patch_embed_proj")(x.astype(self.dtype))
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
                              eps=cfg.vit_ln_eps, dtype=self.dtype,
                              name=f"blocks_{i}")(tokens)
            if i in cfg.hooks:
                hook_outs.append(tokens)

        # readout 'project' (cat cls -> Linear(2d, d) -> GELU), then reassemble
        def project(t, idx):
            clsr = jnp.broadcast_to(t[:, :1], t[:, 1:].shape)
            h = jnp.concatenate([t[:, 1:], clsr], axis=-1)
            h = nn.Dense(cfg.vit_dim, dtype=self.dtype,
                         name=f"readout_{idx}_project")(h)
            return nn.gelu(h, approximate=False).reshape(b, gh, gw, cfg.vit_dim)

        nc = cfg.neck_channels
        l1 = nn.Conv(nc[0], (1, 1), dtype=self.dtype, name="reassemble1_proj")(
            project(hook_outs[0], 1))
        l1 = BlockUpsample(nc[0], 4, dtype=self.dtype, name="reassemble1_resize")(l1)
        l2 = nn.Conv(nc[1], (1, 1), dtype=self.dtype, name="reassemble2_proj")(
            project(hook_outs[1], 2))
        l2 = BlockUpsample(nc[1], 2, dtype=self.dtype, name="reassemble2_resize")(l2)
        l3 = nn.Conv(nc[2], (1, 1), dtype=self.dtype, name="reassemble3_proj")(
            project(hook_outs[2], 3))
        l4 = nn.Conv(nc[3], (1, 1), dtype=self.dtype, name="reassemble4_proj")(
            project(hook_outs[3], 4))
        l4 = nn.Conv(nc[3], (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                     name="reassemble4_down")(l4)

        f = cfg.features
        l1_rn = nn.Conv(f, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        name="layer1_rn")(l1)
        l2_rn = nn.Conv(f, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        name="layer2_rn")(l2)
        l3_rn = nn.Conv(f, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        name="layer3_rn")(l3)
        l4_rn = nn.Conv(f, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        name="layer4_rn")(l4)

        p4 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet4")(l4_rn)
        p3 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet3")(p4, l3_rn)
        p2 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet2")(p3, l2_rn)
        p1 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet1")(p2, l1_rn)

        h = nn.Conv(f // 2, (3, 3), padding=1, dtype=self.dtype, name="head_conv1")(p1)
        h = _resize_bilinear_ac(h, 2 * h.shape[1], 2 * h.shape[2])
        h = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                            name="head_conv2")(h))
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


def dpt_large_key_map(key: str):
    """HF ``DPTForDepthEstimation`` (Intel/dpt-large) state dict -> our paths.

    q/k/v are separate in HF naming; ``port_dpt_large`` pre-merges them into the fused
    ``qkv`` leaf before this map runs (keys ``...attention.attention.qkv.*``)."""
    import re

    k = key
    if k.startswith("dpt.embeddings."):
        k = k[len("dpt.embeddings."):]
        if k == "cls_token":
            return "cls_token"
        if k == "position_embeddings":
            return "pos_embed"
        if k.startswith("patch_embeddings.projection."):
            leaf = "kernel" if k.endswith("weight") else "bias"
            return f"patch_embed_proj.{leaf}"
        return k
    m = re.match(r"dpt\.encoder\.layer\.(\d+)\.(.*)", k)
    if m:
        i, rest = m.groups()
        table = {
            "layernorm_before.weight": "norm1.scale",
            "layernorm_before.bias": "norm1.bias",
            "layernorm_after.weight": "norm2.scale",
            "layernorm_after.bias": "norm2.bias",
            "attention.attention.qkv.weight": "qkv.kernel",
            "attention.attention.qkv.bias": "qkv.bias",
            "attention.output.dense.weight": "proj.kernel",
            "attention.output.dense.bias": "proj.bias",
            "intermediate.dense.weight": "fc1.kernel",
            "intermediate.dense.bias": "fc1.bias",
            "output.dense.weight": "fc2.kernel",
            "output.dense.bias": "fc2.bias",
        }
        return f"blocks_{i}.{table[rest]}" if rest in table else None
    if k.startswith("dpt.layernorm.") or k.startswith("dpt.pooler."):
        return None  # post-encoder norm/pooler: the DPT hooks bypass both
    m = re.match(r"neck\.reassemble_stage\.readout_projects\.(\d)\.0\.(weight|bias)", k)
    if m:
        i, leaf = m.groups()
        return f"readout_{int(i) + 1}_project.{'kernel' if leaf == 'weight' else leaf}"
    m = re.match(r"neck\.reassemble_stage\.layers\.(\d)\.(projection|resize)\.(weight|bias)", k)
    if m:
        i, part, leaf = m.groups()
        leaf = "kernel" if leaf == "weight" else leaf
        if part == "projection":
            return f"reassemble{int(i) + 1}_proj.{leaf}"
        return (f"reassemble{int(i) + 1}_resize.{leaf}" if i in "01"
                else None if i == "2" else f"reassemble4_down.{leaf}")
    m = re.match(r"neck\.convs\.(\d)\.weight", k)
    if m:
        return f"layer{int(m.group(1)) + 1}_rn.kernel"
    m = re.match(r"neck\.fusion_stage\.layers\.(\d)\.(.*)", k)
    if m:
        i, rest = m.groups()
        n = 4 - int(i)  # HF fusion layer 0 consumes the deepest feature (refinenet4)
        if n == 4 and rest.startswith("residual_layer1."):
            return None  # dead weights: the first fusion layer never receives a skip
        rest = rest.replace("projection.", "out_conv.")
        rest = rest.replace("residual_layer1.", "resConfUnit1.")
        rest = rest.replace("residual_layer2.", "resConfUnit2.")
        rest = rest.replace("convolution", "conv")
        rest = rest.replace(".weight", ".kernel")
        return f"refinenet{n}.{rest}"
    m = re.match(r"head\.head\.(\d)\.(weight|bias)", k)
    if m:
        idx, leaf = m.groups()
        name = {"0": "head_conv1", "2": "head_conv2", "4": "head_conv3"}[idx]
        return f"{name}.{'kernel' if leaf == 'weight' else leaf}"
    return k


def port_dpt_large(state_dict, template, strict: bool = True):
    """Intel/dpt-large HF checkpoint -> DPTLargeDepth params (strict key coverage).

    Merges HF's separate q/k/v leaves into the fused qkv kernel/bias first (torch
    row-major stacking: [q; k; v] along the output dim), then fits each mapped tensor
    (conv OIHW->HWIO, ConvTranspose (in,out,k,k)->(k,k,in,out), linear transpose)."""
    import re

    from lkgd_tpu.utils.porting import _fit_tensor

    sd = dict(state_dict)
    for key in list(sd):
        m = re.match(r"(dpt\.encoder\.layer\.\d+\.attention\.attention\.)query\.(weight|bias)", key)
        if m:
            prefix, leaf = m.groups()
            q = np.asarray(sd.pop(f"{prefix}query.{leaf}"))
            k_ = np.asarray(sd.pop(f"{prefix}key.{leaf}"))
            v = np.asarray(sd.pop(f"{prefix}value.{leaf}"))
            sd[f"{prefix}qkv.{leaf}"] = np.concatenate([q, k_, v], axis=0)

    leaves = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        leaves[keys] = (tuple(leaf.shape), leaf.dtype)

    produced, unused = {}, []
    for key, tensor in sd.items():
        mapped = dpt_large_key_map(key)
        if mapped is None:
            continue
        path = ("params",) + tuple(mapped.split("."))
        if path not in leaves:
            unused.append(key)
            continue
        t = np.asarray(tensor)
        if "reassemble" in mapped and mapped.endswith("_resize.kernel"):
            t = t.transpose(2, 3, 0, 1)  # ConvTranspose (in, out, k, k) -> (k, k, in, out)
            fitted = t if t.shape == leaves[path][0] else None
        else:
            fitted = _fit_tensor(t, leaves[path][0], is_kernel=(path[-1] == "kernel"))
        if fitted is None:
            raise ValueError(f"{key}: shape {np.shape(tensor)} !-> {leaves[path][0]}")
        produced[path] = fitted.astype(leaves[path][1])
    missing = [p for p in leaves if p not in produced]
    if strict and (missing or unused):
        raise ValueError(f"dpt-large port: missing {len(missing)} "
                         f"(e.g. {['/'.join(p) for p in missing[:4]]}), "
                         f"unused {len(unused)} (e.g. {unused[:4]})")
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    return jax.tree_util.tree_unflatten(
        treedef, [produced.get(tuple(str(getattr(p, 'key', p)) for p in path),
                               np.asarray(leaf)) for path, leaf in flat])


def make_depth_processor(checkpoint_path: str, cfg: Optional[MidasConfig] = None):
    """The reference's ``depth`` preprocessor: transformers
    ``pipeline('depth-estimation')`` with the default Intel/dpt-large
    (`/root/reference/utils/controlnet_utils.py:103-117`).

    Chain parity: DPTImageProcessor square-384 bicubic resize + rescale + mean/std-0.5
    normalize -> DPTForDepthEstimation -> pipeline postprocess (bicubic
    align_corners=False upsample back to the input size, ``depth * 255 / max`` uint8
    PIL round-trip, ToTensor /255)."""
    from lkgd_tpu.utils.porting import load_state_dict

    cfg = cfg or MidasConfig.large()
    model = DPTLargeDepth(cfg)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    params = port_dpt_large(load_state_dict(checkpoint_path), template)
    fn = jax.jit(lambda img: model.apply(params, img))

    def process(image: np.ndarray) -> np.ndarray:
        import cv2

        h, w = image.shape[:2]
        inp = cv2.resize(image, (cfg.image_size, cfg.image_size),
                         interpolation=cv2.INTER_CUBIC)
        depth = np.asarray(fn(jnp.asarray((inp[None] - 0.5) / 0.5, jnp.float32)))[0]
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_CUBIC)
        formatted = np.clip(depth * 255.0 / (depth.max() + 1e-8), 0, 255).astype(np.uint8)
        out = formatted.astype(np.float32) / 255.0
        return np.repeat(out[..., None], 3, axis=-1)

    return process


def midas_resize_shape(h: int, w: int, target: int = 384, multiple: int = 32,
                       method: str = "minimal") -> Tuple[int, int]:
    """MiDaS ``transforms.Resize`` output shape with keep_aspect_ratio=True and
    ensure_multiple_of (isl-org midas/transforms.py; the dpt transforms in
    controlnet_aux's midas/api.py use resize_mode='minimal'): pick the height/width
    scale toward ``target`` that changes the image least ('minimal': the scale with
    |1-s| smallest; 'lower_bound': both sides >= target), then round each side to the
    nearest multiple of ``multiple``."""
    sh, sw = target / h, target / w
    if method == "minimal":
        s = sh if abs(1 - sh) < abs(1 - sw) else sw
    elif method == "lower_bound":
        s = max(sh, sw)
    else:  # upper_bound
        s = min(sh, sw)

    def to_mult(v):
        return max(multiple, int(round(v / multiple) * multiple))

    return to_mult(s * h), to_mult(s * w)


def make_midas_processor(checkpoint_path: str, cfg: Optional[MidasConfig] = None):
    """control_preprocess-registerable depth callable (controlnet_aux MidasDetector:
    aspect-preserving 'minimal' resize to multiples of 32 toward 384, normalize
    (x-0.5)/0.5, run, min-max normalize the inverse depth). Non-native grids resample
    the pos_embed (forward_flex); each distinct input shape compiles once."""
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
        rh, rw = midas_resize_shape(h, w, target=cfg.image_size)
        inp = cv2.resize(image, (rw, rh), interpolation=cv2.INTER_CUBIC)
        depth = np.asarray(fn(jnp.asarray((inp[None] - 0.5) / 0.5, jnp.float32)))[0]
        depth = (depth - depth.min()) / (depth.max() - depth.min() + 1e-8)
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_LINEAR)
        return np.repeat(depth[..., None], 3, axis=-1).astype(np.float32)

    return process
