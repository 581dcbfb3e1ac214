"""UniMatch / GMFlow optical-flow estimator — TPU-native re-implementation.

Architecture parity with `/root/reference/unimatch/` (flow task, the only one the LKGD
stack uses): residual CNN encoder with a weight-shared two-stride trident conv
(`backbone.py:39-120`, `trident_conv.py:10-90`), 6 single-head transformer blocks with
swin-style split-window self/cross attention (`transformer.py:9-230`,
`attention.py:8-105`), global/local correlation softmax matching (`matching.py:7-85`),
self-attention flow propagation (`attention.py:166-240`), RAFT-style convex upsampling
(`utils.py:134-153`) and the SepConvGRU regression refinement (`reg_refine.py:6-110`).

Reference config for the LKGD conditioning path (`utils/optical_flow.py:15-31`):
128 channels, 2 scales, swin splits (2, 8), corr radius (-1, 4), prop radius (-1, 1),
reg_refine with 1 iteration, upsample factor 4.

Everything is channels-last; the correlation volumes are plain einsums (MXU-friendly) and
the grid_sample gathers become static gathers under jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lkgd_tpu.models.layers import LayerNorm


@dataclasses.dataclass(frozen=True)
class UniMatchConfig:
    feature_channels: int = 128
    num_scales: int = 2
    upsample_factor: int = 4
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    reg_refine: bool = True
    attn_splits_list: Tuple[int, ...] = (2, 8)
    corr_radius_list: Tuple[int, ...] = (-1, 4)
    prop_radius_list: Tuple[int, ...] = (-1, 1)
    num_reg_refine: int = 1

    @classmethod
    def lkgd(cls) -> "UniMatchConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "UniMatchConfig":
        return cls(feature_channels=32, num_scales=2, num_transformer_layers=2,
                   attn_splits_list=(2, 2), corr_radius_list=(-1, 2),
                   prop_radius_list=(-1, 1), num_reg_refine=1)


# ------------------------------------------------------------------ functional helpers
def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.InstanceNorm2d default: per-sample per-channel over H,W, no affine."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def coords_grid(h: int, w: int) -> jnp.ndarray:
    """(H, W, 2) pixel coordinates, (x, y) order (geometry.py:5-21)."""
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.stack([x, y], axis=-1)


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=True, zeros padding): img (B,H,W,C), coords (B,...,2)
    pixel-space (x, y). Returns (B, ..., C)."""
    b, h, w, c = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, h * w, c)
        idx = yi_c * w + xi_c  # (B, ...)
        out = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1)
        out = out.reshape(idx.shape + (c,))
        return out * valid[..., None].astype(img.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def flow_warp(feature: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp (B,H,W,C) by flow (B,H,W,2) (geometry.py:65)."""
    b, h, w, _ = feature.shape
    coords = coords_grid(h, w)[None] + flow
    return bilinear_sample(feature, coords)


def position_embedding_sine(h: int, w: int, num_pos_feats: int, temperature: int = 10000
                            ) -> jnp.ndarray:
    """DETR sine embedding (position.py:9-47), channels-last (H, W, 2*num_pos_feats)."""
    scale = 2 * math.pi
    y_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    eps = 1e-6
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
                      ).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3
                      ).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def split_windows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*k*k, H/k, W/k, C) (utils.py split_feature)."""
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * k * k, h // k, w // k, c)


def merge_windows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    bk, hk, wk, c = x.shape
    b = bk // (k * k)
    x = x.reshape(b, k, k, hk, wk, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, k * hk, k * wk, c)


def shift_window_attn_mask(h: int, w: int, k: int) -> jnp.ndarray:
    """Swin shifted-window attention mask (utils.py:84-109): (k*k, win, win) additive."""
    win_h, win_w = h // k, w // k
    shift_h, shift_w = win_h // 2, win_w // 2
    img_mask = jnp.zeros((h, w))
    cnt = 0
    h_slices = (slice(0, -win_h), slice(-win_h, -shift_h), slice(-shift_h, None))
    w_slices = (slice(0, -win_w), slice(-win_w, -shift_w), slice(-shift_w, None))
    for hs in h_slices:
        for ws in w_slices:
            img_mask = img_mask.at[hs, ws].set(cnt)
            cnt += 1
    windows = split_windows(img_mask[None, :, :, None], k).reshape(-1, win_h * win_w)
    diff = windows[:, None, :] - windows[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


def _single_head_attention(q, k, v, mask=None):
    """(B, L, C) single-head softmax attention with fp32 logits."""
    scale = q.shape[-1] ** 0.5
    logits = jnp.einsum("blc,bmc->blm", q, k, preferred_element_type=jnp.float32) / scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("blm,bmc->blc", probs, v, preferred_element_type=v.dtype)


def split_window_attention(q, k, v, num_splits: int, h: int, w: int, with_shift: bool,
                           attn_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Swin split-window single-head attention (attention.py:45-105). (B, H*W, C) in/out."""
    b, _, c = q.shape
    qs = q.reshape(b, h, w, c)
    ks = k.reshape(b, h, w, c)
    vs = v.reshape(b, h, w, c)
    if with_shift:
        sh, sw = (h // num_splits) // 2, (w // num_splits) // 2
        qs = jnp.roll(qs, (-sh, -sw), axis=(1, 2))
        ks = jnp.roll(ks, (-sh, -sw), axis=(1, 2))
        vs = jnp.roll(vs, (-sh, -sw), axis=(1, 2))
    qw = split_windows(qs, num_splits).reshape(b * num_splits**2, -1, c)
    kw = split_windows(ks, num_splits).reshape(b * num_splits**2, -1, c)
    vw = split_windows(vs, num_splits).reshape(b * num_splits**2, -1, c)
    mask = None
    if with_shift and attn_mask is not None:
        mask = jnp.tile(attn_mask, (b, 1, 1))
    out = _single_head_attention(qw, kw, vw, mask)
    out = merge_windows(out.reshape(b * num_splits**2, h // num_splits, w // num_splits, c),
                        num_splits)
    if with_shift:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out.reshape(b, -1, c)


# ------------------------------------------------------------------ modules
class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_planes = x.shape[-1]
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1 or in_planes != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, name="downsample")(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    """Residual backbone with trident multi-scale output (backbone.py:39-120)."""

    output_dim: int = 128
    num_scales: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        dims = (64, 96, 128)
        x = nn.Conv(dims[0], (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(instance_norm(x))
        x = ResidualBlock(dims[0], 1, dtype=self.dtype, name="layer1_0")(x)
        x = ResidualBlock(dims[0], 1, dtype=self.dtype, name="layer1_1")(x)
        x = ResidualBlock(dims[1], 2, dtype=self.dtype, name="layer2_0")(x)
        x = ResidualBlock(dims[1], 1, dtype=self.dtype, name="layer2_1")(x)
        stride3 = 2 if self.num_scales == 1 else 1
        x = ResidualBlock(dims[2], stride3, dtype=self.dtype, name="layer3_0")(x)
        x = ResidualBlock(dims[2], 1, dtype=self.dtype, name="layer3_1")(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)
        if self.num_scales == 1:
            return [x]
        # trident conv: ONE shared weight applied at strides (1, 2, ...) — high to low res
        kernel = self.param("trident_weight", nn.initializers.he_uniform(),
                            (3, 3, self.output_dim, self.output_dim))
        outs = []
        for i in range(self.num_scales):
            s = 2**i
            outs.append(jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (s, s), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return outs


class TransformerLayer(nn.Module):
    """Single-head attention layer with post-norm + concat-FFN (transformer.py:9-145)."""

    d_model: int
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, source, target, h, w, attn_num_splits, with_shift, attn_mask):
        q = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="q_proj")(source)
        k = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="k_proj")(target)
        v = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="v_proj")(target)
        if attn_num_splits > 1:
            message = split_window_attention(q, k, v, attn_num_splits, h, w, with_shift,
                                             attn_mask)
        else:
            message = _single_head_attention(q, k, v)
        message = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="merge")(message)
        message = LayerNorm(dtype=self.dtype, name="norm1")(message)
        if not self.no_ffn:
            hcat = jnp.concatenate([source, message], axis=-1)
            hcat = nn.Dense(2 * self.d_model * self.ffn_dim_expansion, use_bias=False,
                            dtype=self.dtype, name="mlp_0")(hcat)
            hcat = nn.gelu(hcat, approximate=False)
            message = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                               name="mlp_2")(hcat)
            message = LayerNorm(dtype=self.dtype, name="norm2")(message)
        return source + message


class FeatureTransformer(nn.Module):
    """6 blocks of (self-attn, cross-attn+FFN), both images updated symmetrically by
    batch-concatenation (transformer.py:203-280). Shifted windows on odd blocks."""

    d_model: int = 128
    num_layers: int = 6
    ffn_dim_expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature0: jnp.ndarray, feature1: jnp.ndarray, attn_num_splits: int):
        b, h, w, c = feature0.shape
        f0 = feature0.reshape(b, h * w, c)
        f1 = feature1.reshape(b, h * w, c)
        attn_mask = (shift_window_attn_mask(h, w, attn_num_splits)
                     if attn_num_splits > 1 else None)
        # concat both directions into the batch: (2B, L, C)
        for i in range(self.num_layers):
            with_shift = attn_num_splits > 1 and i % 2 == 1
            src = jnp.concatenate([f0, f1], axis=0)
            src = TransformerLayer(self.d_model, no_ffn=True,
                                   ffn_dim_expansion=self.ffn_dim_expansion,
                                   dtype=self.dtype, name=f"layers_{i}_self_attn")(
                                       src, src, h, w, attn_num_splits, with_shift, attn_mask)
            f0s, f1s = jnp.split(src, 2, axis=0)
            tgt_cross = jnp.concatenate([f1s, f0s], axis=0)
            src = TransformerLayer(self.d_model, no_ffn=False,
                                   ffn_dim_expansion=self.ffn_dim_expansion,
                                   dtype=self.dtype, name=f"layers_{i}_cross_attn_ffn")(
                                       src, tgt_cross, h, w, attn_num_splits, with_shift,
                                       attn_mask)
            f0, f1 = jnp.split(src, 2, axis=0)
        return f0.reshape(b, h, w, c), f1.reshape(b, h, w, c)


def global_correlation_softmax(feature0: jnp.ndarray, feature1: jnp.ndarray) -> jnp.ndarray:
    """Global matching flow (matching.py:7-37). (B,H,W,C) -> flow (B,H,W,2)."""
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)
    corr = jnp.einsum("blc,bmc->blm", f0, f1, preferred_element_type=jnp.float32) / (c**0.5)
    prob = jax.nn.softmax(corr, axis=-1)
    grid = coords_grid(h, w).reshape(1, h * w, 2)
    correspondence = jnp.einsum("blm,bmx->blx", prob, jnp.tile(grid, (b, 1, 1)))
    return (correspondence - grid).reshape(b, h, w, 2)


def local_correlation_softmax(feature0: jnp.ndarray, feature1: jnp.ndarray, radius: int
                              ) -> jnp.ndarray:
    """Local window matching flow (matching.py:39-85)."""
    b, h, w, c = feature0.shape
    win = 2 * radius + 1
    dy, dx = jnp.meshgrid(jnp.arange(-radius, radius + 1, dtype=jnp.float32),
                          jnp.arange(-radius, radius + 1, dtype=jnp.float32), indexing="ij")
    offsets = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)  # (win^2, 2) (x, y)
    coords = coords_grid(h, w).reshape(1, h * w, 1, 2) + offsets[None, None]  # (1,HW,win^2,2)
    coords = jnp.tile(coords, (b, 1, 1, 1))
    valid = ((coords[..., 0] >= 0) & (coords[..., 0] <= w - 1)
             & (coords[..., 1] >= 0) & (coords[..., 1] <= h - 1))
    sampled = bilinear_sample(feature1, coords)  # (B, HW, win^2, C)
    f0 = feature0.reshape(b, h * w, 1, c)
    corr = jnp.einsum("blxc,blyc->bly", f0, sampled,
                      preferred_element_type=jnp.float32) / (c**0.5)
    corr = jnp.where(valid, corr, -1e4)
    prob = jax.nn.softmax(corr, axis=-1)
    correspondence = jnp.einsum("bly,blyx->blx", prob, coords)
    return (correspondence - coords_grid(h, w).reshape(1, h * w, 2)).reshape(b, h, w, 2)


def global_correlation_softmax_stereo(feature0: jnp.ndarray, feature1: jnp.ndarray
                                      ) -> jnp.ndarray:
    """Horizontal-only global matching for rectified stereo (matching.py:126-151).

    Candidate positions to the RIGHT of the query are masked out so disparity
    (x_query - x_match) stays positive. (B,H,W,C) -> disparity (B,H,W,1).
    """
    b, h, w, c = feature0.shape
    corr = jnp.einsum("bhic,bhjc->bhij", feature0, feature1,
                      preferred_element_type=jnp.float32) / (c**0.5)  # (B,H,W,W)
    xg = jnp.arange(w, dtype=jnp.float32)
    invalid = xg[None, :] > xg[:, None]  # match col j right of query col i
    corr = jnp.where(invalid, -1e9, corr)
    prob = jax.nn.softmax(corr, axis=-1)
    correspondence = jnp.einsum("bhij,j->bhi", prob, xg)
    disparity = xg[None, None, :] - correspondence
    return disparity[..., None]


def local_correlation_softmax_stereo(feature0: jnp.ndarray, feature1: jnp.ndarray,
                                     radius: int) -> jnp.ndarray:
    """1D horizontal window matching for stereo (matching.py:154-200).
    (B,H,W,C) -> disparity (B,H,W,1)."""
    b, h, w, c = feature0.shape
    ox = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    offsets = jnp.stack([ox, jnp.zeros_like(ox)], axis=-1)  # (2R+1, 2) x-only
    grid = coords_grid(h, w).reshape(1, h * w, 1, 2)
    coords = jnp.tile(grid + offsets[None, None], (b, 1, 1, 1))
    valid = ((coords[..., 0] >= 0) & (coords[..., 0] <= w - 1)
             & (coords[..., 1] >= 0) & (coords[..., 1] <= h - 1))
    sampled = bilinear_sample(feature1, coords)  # (B, HW, 2R+1, C)
    f0 = feature0.reshape(b, h * w, 1, c)
    corr = jnp.einsum("blxc,blyc->bly", f0, sampled,
                      preferred_element_type=jnp.float32) / (c**0.5)
    corr = jnp.where(valid, corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)
    correspondence = jnp.einsum("bly,blyx->blx", prob, coords)  # (B, HW, 2)
    disparity = -(correspondence - coords_grid(h, w).reshape(1, h * w, 2))[..., 0]
    return disparity.reshape(b, h, w, 1)


def warp_with_pose_depth_candidates(feature1: jnp.ndarray, intrinsics: jnp.ndarray,
                                    pose: jnp.ndarray, depth: jnp.ndarray,
                                    clamp_min_depth: float = 1e-3) -> jnp.ndarray:
    """Plane-sweep warp (matching.py:239-285): back-project each pixel at every depth
    candidate, transform by the relative pose, reproject, and sample feature1.

    feature1 (B,H,W,C), intrinsics (B,3,3), pose (B,4,4) source->target,
    depth (B,D,H,W) ACTUAL depth. Returns (B, D, H*W, C).
    """
    b, d, h, w = depth.shape
    grid = coords_grid(h, w).reshape(-1, 2)  # (HW, 2) xy
    homo = jnp.concatenate([grid, jnp.ones((h * w, 1), jnp.float32)], axis=-1).T  # (3, HW)
    rays = jnp.einsum("bij,jn->bin", jnp.linalg.inv(intrinsics), homo)  # (B,3,HW)
    rot = jnp.einsum("bij,bjn->bin", pose[:, :3, :3], rays)
    pts = rot[:, :, None, :] * depth.reshape(b, 1, d, h * w)  # (B,3,D,HW)
    pts = pts + pose[:, :3, 3][:, :, None, None]
    proj = jnp.einsum("bij,bjdn->bidn", intrinsics, pts)  # (B,3,D,HW)
    pix = proj[:, :2] / jnp.maximum(proj[:, 2:3], clamp_min_depth)
    coords = jnp.moveaxis(pix, 1, -1)  # (B,D,HW,2)
    return bilinear_sample(feature1, coords)  # (B,D,HW,C)


def correlation_softmax_depth(feature0: jnp.ndarray, feature1: jnp.ndarray,
                              intrinsics: jnp.ndarray, pose: jnp.ndarray,
                              depth_candidates: jnp.ndarray,
                              depth_from_argmax: bool = False) -> jnp.ndarray:
    """Plane-sweep matching (matching.py:203-236). depth_candidates (B,D,H,W) are
    INVERSE depths; returns the matched inverse depth (B,H,W,1)."""
    b, h, w, c = feature0.shape
    d = depth_candidates.shape[1]
    warped = warp_with_pose_depth_candidates(feature1, intrinsics, pose,
                                             1.0 / depth_candidates)  # (B,D,HW,C)
    corr = jnp.einsum("bnc,bdnc->bdn", feature0.reshape(b, h * w, c), warped,
                      preferred_element_type=jnp.float32) / (c**0.5)
    prob = jax.nn.softmax(corr, axis=1)  # over candidates
    cand = depth_candidates.reshape(b, d, h * w)
    if depth_from_argmax:
        idx = jnp.argmax(prob, axis=1, keepdims=True)
        depth = jnp.take_along_axis(cand, idx, axis=1)[:, 0]
    else:
        depth = jnp.sum(prob * cand, axis=1)
    return depth.reshape(b, h, w, 1)


def compute_flow_with_depth_pose(depth: jnp.ndarray, intrinsics: jnp.ndarray,
                                 pose: jnp.ndarray) -> jnp.ndarray:
    """Rigid flow induced by depth + relative pose (geometry.py:175-195).
    depth (B,H,W) ACTUAL depth -> flow (B,H,W,2)."""
    b, h, w = depth.shape
    grid = coords_grid(h, w).reshape(-1, 2)
    homo = jnp.concatenate([grid, jnp.ones((h * w, 1), jnp.float32)], axis=-1).T
    rays = jnp.einsum("bij,jn->bin", jnp.linalg.inv(intrinsics), homo)
    rot = jnp.einsum("bij,bjn->bin", pose[:, :3, :3], rays)
    pts = rot * depth.reshape(b, 1, h * w) + pose[:, :3, 3][:, :, None]
    proj = jnp.einsum("bij,bjn->bin", intrinsics, pts)
    pix = proj[:, :2] / jnp.maximum(proj[:, 2:3], 1e-3)
    reproj = jnp.moveaxis(pix, 1, -1).reshape(b, h, w, 2)
    return reproj - coords_grid(h, w)[None]


def local_correlation_with_flow(feature0, feature1, flow, radius: int) -> jnp.ndarray:
    """Correlation volume at flow-shifted windows (matching.py:88-130) ->
    (B, H, W, (2R+1)^2)."""
    b, h, w, c = feature0.shape
    dy, dx = jnp.meshgrid(jnp.arange(-radius, radius + 1, dtype=jnp.float32),
                          jnp.arange(-radius, radius + 1, dtype=jnp.float32), indexing="ij")
    offsets = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)
    coords = (coords_grid(h, w).reshape(1, h * w, 1, 2) + offsets[None, None]
              + flow.reshape(b, h * w, 1, 2))
    sampled = bilinear_sample(feature1, coords)  # (B, HW, win^2, C)
    f0 = feature0.reshape(b, h * w, 1, c)
    corr = jnp.einsum("blxc,blyc->bly", f0, sampled,
                      preferred_element_type=jnp.float32) / (c**0.5)
    return corr.reshape(b, h, w, -1).astype(feature0.dtype)


class SelfAttnPropagation(nn.Module):
    """Flow propagation: q/k from features, value = flow (attention.py:166-240).
    NOTE the reference quirk: key = k_proj(q_proj(x)) — kept for weight parity."""

    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature0: jnp.ndarray, flow: jnp.ndarray,
                 local_window_radius: int = -1) -> jnp.ndarray:
        b, h, w, c = feature0.shape
        vc = flow.shape[-1]  # 2 for flow, 1 for disparity / inverse depth
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(feature0.reshape(b, h * w, c))
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(q)
        v = flow.reshape(b, h * w, vc)
        if local_window_radius > 0:
            r = local_window_radius
            win = 2 * r + 1
            dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1, dtype=jnp.float32),
                                  jnp.arange(-r, r + 1, dtype=jnp.float32), indexing="ij")
            offsets = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)
            coords = coords_grid(h, w).reshape(1, h * w, 1, 2) + offsets[None, None]
            coords = jnp.tile(coords, (b, 1, 1, 1))
            # zero-padded neighborhood gathers (reference uses F.unfold = zero pad)
            k_win = bilinear_sample(k.reshape(b, h, w, c), coords)  # (B, HW, win^2, C)
            v_win = bilinear_sample(flow, coords)  # (B, HW, win^2, vc)
            logits = jnp.einsum("blc,blyc->bly", q, k_win,
                                preferred_element_type=jnp.float32) / (c**0.5)
            prob = jax.nn.softmax(logits, axis=-1).astype(v_win.dtype)
            out = jnp.einsum("bly,blyx->blx", prob, v_win)
        else:
            out = _single_head_attention(q, k, v.astype(q.dtype))
        return out.reshape(b, h, w, vc)


class ConvexUpsampler(nn.Module):
    """RAFT convex upsampling mask head + application (unimatch.py:50-52, utils.py:134)."""

    upsample_factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow: jnp.ndarray, feature: jnp.ndarray,
                 is_depth: bool = False) -> jnp.ndarray:
        k = self.upsample_factor
        x = jnp.concatenate([flow.astype(self.dtype), feature], axis=-1)
        x = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        mask = nn.Conv(k * k * 9, (1, 1), dtype=self.dtype, name="conv2")(x)
        return upsample_flow_with_mask(flow, mask, k, scale_magnitude=not is_depth)


def upsample_flow_with_mask(flow: jnp.ndarray, mask: jnp.ndarray, k: int,
                            scale_magnitude: bool = True) -> jnp.ndarray:
    """(B,H,W,C),(B,H,W,9*k*k) -> (B,k*H,k*W,C) convex combination of 3x3 neighbors.
    Flow/disparity magnitudes scale with resolution; depth does not (utils.py:134-160,
    ``is_depth``)."""
    b, h, w, c = flow.shape
    mask = mask.reshape(b, h, w, 9, k, k)
    mask = jax.nn.softmax(mask.astype(jnp.float32), axis=3)
    # 3x3 zero-padded neighborhoods of k*flow
    fpad = jnp.pad(flow * k if scale_magnitude else flow,
                   ((0, 0), (1, 1), (1, 1), (0, 0)))
    neighbors = jnp.stack([fpad[:, i:i + h, j:j + w] for i in range(3) for j in range(3)],
                          axis=3)  # (B, H, W, 9, C)
    up = jnp.einsum("bhwnkl,bhwnx->bhwklx", mask, neighbors.astype(jnp.float32))
    # (b, h, w, k, l, c) -> (b, h, k, w, l, c) -> (b, h*k, w*l, c)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, c)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        for axis, suffix in ((2, "1"), (1, "2")):  # horizontal (1,5) then vertical (5,1)
            ks = (1, 5) if suffix == "1" else (5, 1)
            pad = ((0, 0), (2, 2)) if suffix == "1" else ((2, 2), (0, 0))
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, ks, padding=pad, dtype=self.dtype,
                                   name=f"convz{suffix}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, ks, padding=pad, dtype=self.dtype,
                                   name=f"convr{suffix}")(hx))
            q = nn.tanh(nn.Conv(self.hidden_dim, ks, padding=pad, dtype=self.dtype,
                                name=f"convq{suffix}")(jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class BasicUpdateBlock(nn.Module):
    """RAFT-style GRU refinement (reg_refine.py:56-140)."""

    corr_channels: int
    downsample_factor: int
    flow_dim: int = 2  # 1 for stereo disparity / inverse depth (reg_refine.py:83)
    bilinear_up: bool = False  # depth model has no convex-mask head (reg_refine.py:98)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        # motion encoder
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype, name="convf1")(flow.astype(self.dtype)))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="convf2")(f))
        m = nn.relu(nn.Conv(128 - self.flow_dim, (3, 3), padding=1, dtype=self.dtype,
                            name="conv")(jnp.concatenate([c, f], axis=-1)))
        motion = jnp.concatenate([m, flow.astype(self.dtype)], axis=-1)  # 128 ch

        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(128, dtype=self.dtype, name="gru")(net, inp)

        dflow = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="flow_head_conv1")(net)
        dflow = nn.Conv(self.flow_dim, (3, 3), padding=1, dtype=self.dtype,
                        name="flow_head_conv2")(nn.relu(dflow))

        if self.bilinear_up:
            return net, None, dflow
        k = self.downsample_factor
        mask = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="mask_conv1")(net)
        mask = nn.Conv(k * k * 9, (1, 1), dtype=self.dtype, name="mask_conv2")(nn.relu(mask))
        return net, mask, dflow


def _bilinear_resize_flow(flow: jnp.ndarray, scale: int) -> jnp.ndarray:
    """x2 bilinear upsample with align_corners=True semantics + magnitude scaling."""
    b, h, w, c = flow.shape
    out_h, out_w = h * scale, w * scale
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)[None]  # (1,out_h,out_w,2)
    coords = jnp.tile(coords, (b, 1, 1, 1))
    return bilinear_sample(flow, coords) * scale


class UniMatch(nn.Module):
    config: UniMatchConfig = UniMatchConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray, task: str = "flow",
                 intrinsics: jnp.ndarray = None, pose: jnp.ndarray = None,
                 min_depth: float = 1.0 / 0.5, max_depth: float = 1.0 / 10,
                 num_depth_candidates: int = 64, depth_from_argmax: bool = False
                 ) -> jnp.ndarray:
        """img0/img1: (B, H, W, 3) in [0, 255] (we normalize internally for every task;
        the reference normalizes stereo/depth in the dataloader, unimatch.py:122-124).

        task='flow'   -> flow (B, H, W, 2) in pixels (unimatch.py:95-361)
        task='stereo' -> positive disparity (B, H, W); img1 is the RIGHT view
        task='depth'  -> depth (B, H, W); needs ``intrinsics`` (B,3,3) and relative
                         ``pose`` (B,4,4); min/max_depth are INVERSE-depth range bounds.
        Task is a static (trace-time) argument; the learnable parameters are
        task-agnostic except the reg-refine update block (flow_dim differs).
        """
        cfg = self.config
        if task not in ("flow", "stereo", "depth"):
            raise ValueError(f"unknown task {task!r}; expected flow|stereo|depth")
        if task == "depth":
            assert cfg.num_scales == 1, "multi-scale depth unsupported (unimatch.py:116)"
            assert intrinsics is not None and pose is not None
            inv_lo = min(min_depth, max_depth)
            inv_hi = max(min_depth, max_depth)
        mean = jnp.asarray([0.485, 0.456, 0.406], img0.dtype) * 255
        std = jnp.asarray([0.229, 0.224, 0.225], img0.dtype) * 255
        img0 = (img0 - mean) / std
        img1 = (img1 - mean) / std

        feats = CNNEncoder(cfg.feature_channels, cfg.num_scales, dtype=self.dtype,
                           name="backbone")(jnp.concatenate([img0, img1], axis=0))
        feats = feats[::-1]  # low to high resolution

        transformer = FeatureTransformer(cfg.feature_channels, cfg.num_transformer_layers,
                                         cfg.ffn_dim_expansion, dtype=self.dtype,
                                         name="transformer")
        prop = SelfAttnPropagation(cfg.feature_channels, dtype=self.dtype,
                                   name="feature_flow_attn")

        flow = None
        for scale_idx in range(cfg.num_scales):
            f01 = feats[scale_idx]
            feature0, feature1 = jnp.split(f01, 2, axis=0)
            feature0_ori, feature1_ori = feature0, feature1

            if scale_idx > 0:
                flow = _bilinear_resize_flow(flow, 2)
            if flow is not None:
                flow = jax.lax.stop_gradient(flow)
                if task == "stereo":  # disparity -> horizontal displacement
                    displace = jnp.concatenate([-flow, jnp.zeros_like(flow)], axis=-1)
                    feature1 = flow_warp(feature1, displace)
                else:
                    feature1 = flow_warp(feature1, flow)

            attn_splits = cfg.attn_splits_list[scale_idx]
            corr_radius = cfg.corr_radius_list[scale_idx]
            prop_radius = cfg.prop_radius_list[scale_idx]

            # positional encoding added per split window (utils.py:111-132)
            b, h, w, c = feature0.shape
            if attn_splits > 1:
                pos = position_embedding_sine(h // attn_splits, w // attn_splits, c // 2)
                pos = jnp.tile(pos, (attn_splits, attn_splits, 1))[None]
            else:
                pos = position_embedding_sine(h, w, c // 2)[None]
            feature0 = feature0 + pos.astype(feature0.dtype)
            feature1 = feature1 + pos.astype(feature1.dtype)

            feature0, feature1 = transformer(feature0, feature1, attn_splits)

            if task == "depth":
                ds = cfg.upsample_factor * 2 ** (cfg.num_scales - 1 - scale_idx)
                intrinsics_curr = intrinsics.at[:, :2].set(intrinsics[:, :2] / ds)
                cands = jnp.broadcast_to(
                    jnp.linspace(min_depth, max_depth, num_depth_candidates,
                                 dtype=jnp.float32).reshape(1, -1, 1, 1),
                    (b, num_depth_candidates, h, w))
                flow_pred = correlation_softmax_depth(
                    feature0, feature1, intrinsics_curr, pose, cands, depth_from_argmax)
            elif corr_radius == -1:
                if task == "stereo":
                    flow_pred = global_correlation_softmax_stereo(feature0, feature1)
                else:
                    flow_pred = global_correlation_softmax(feature0, feature1)
            else:
                if task == "stereo":
                    flow_pred = local_correlation_softmax_stereo(feature0, feature1,
                                                                 corr_radius)
                else:
                    flow_pred = local_correlation_softmax(feature0, feature1, corr_radius)
            flow = flow + flow_pred if flow is not None else flow_pred
            if task == "stereo":
                flow = jnp.maximum(flow, 0.0)  # disparity is positive (unimatch.py:222)

            flow = prop(feature0, jax.lax.stop_gradient(flow),
                        local_window_radius=prop_radius)

            if scale_idx == cfg.num_scales - 1:
                # the convex upsampler exists for non-reg-refine models AND the depth
                # model (reference unimatch.py:47-52)
                if not cfg.reg_refine or task == "depth":
                    upsampler = ConvexUpsampler(cfg.upsample_factor, dtype=self.dtype,
                                                name="upsampler")
                if cfg.reg_refine:
                    refine_proj = nn.Conv(256, (1, 1), dtype=self.dtype, name="refine_proj")
                    update = BasicUpdateBlock((2 * 4 + 1) ** 2, cfg.upsample_factor,
                                              flow_dim=2 if task == "flow" else 1,
                                              bilinear_up=task == "depth",
                                              dtype=self.dtype, name="refine")
                    for _ in range(cfg.num_reg_refine):
                        flow = jax.lax.stop_gradient(flow)
                        if task == "stereo":
                            displace = jnp.concatenate([-flow, jnp.zeros_like(flow)],
                                                       axis=-1)
                            correlation = local_correlation_with_flow(
                                feature0_ori, feature1_ori, displace, radius=4)
                        elif task == "depth":
                            rigid = compute_flow_with_depth_pose(
                                1.0 / flow[..., 0], intrinsics_curr, pose)
                            correlation = local_correlation_with_flow(
                                feature0_ori, feature1_ori, rigid, radius=4)
                        else:
                            correlation = local_correlation_with_flow(
                                feature0_ori, feature1_ori, flow, radius=4)
                        proj = refine_proj(feature0)
                        net, inp = jnp.split(proj, 2, axis=-1)
                        net = jnp.tanh(net)
                        inp = nn.relu(inp)
                        net, up_mask, residual = update(net, inp, correlation, flow)
                        if task == "depth":
                            flow = jnp.clip(flow - residual.astype(jnp.float32),
                                            inv_lo, inv_hi)
                        else:
                            flow = flow + residual.astype(jnp.float32)
                        if task == "stereo":
                            flow = jnp.maximum(flow, 0.0)

                # final upsample to image resolution
                if task == "stereo":
                    if cfg.reg_refine:
                        flow_up = upsample_flow_with_mask(flow, up_mask,
                                                          cfg.upsample_factor)
                    else:
                        pad = jnp.concatenate([-flow, jnp.zeros_like(flow)], axis=-1)
                        flow_up = -upsampler(pad, feature0)[..., :1]
                    flow_up = flow_up[..., 0]  # (B, H, W) disparity
                elif task == "depth":
                    pad = jnp.concatenate([flow, jnp.zeros_like(flow)], axis=-1)
                    inv_up = upsampler(pad, feature0, is_depth=True)[..., :1]
                    # zero padding in the convex unfold can pull values out of range
                    inv_up = jnp.clip(inv_up, inv_lo, inv_hi)
                    flow_up = 1.0 / inv_up[..., 0]  # (B, H, W) depth
                else:
                    if cfg.reg_refine:
                        flow_up = upsample_flow_with_mask(flow, up_mask,
                                                          cfg.upsample_factor)
                    else:
                        flow_up = upsampler(flow, feature0)
        return flow_up
