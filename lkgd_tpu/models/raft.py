"""RAFT optical flow (Teed & Deng, ECCV 2020) — the reference's fallback flow estimator.

The reference wraps torchvision's ``raft_large`` for pseudo-label flow when UniMatch is
not used (`/root/reference/utils/flow_utils.py:18-64`: ``RAFT_estimate_flow_torchvision``
with bidirectional batching). This is a TPU-native rebuild of that model family:

  * channels-last Flax modules; the iterative refinement is a shared-parameter update
    block applied ``iters`` times (weights tied, loop unrolled at trace time — each
    iteration is one fused GRU step at 1/8 resolution, small for XLA)
  * the all-pairs correlation volume is one einsum (MXU) + 4-level average pooling;
    the radius-4 lookup is batched bilinear gathers (``bilinear_sample``) — no
    grid_sample custom op needed
  * BatchNorm running statistics are ported as frozen parameters (inference semantics,
    matching torchvision eval mode)

Architecture layout mirrors torchvision ``raft_large`` (feature/context encoders with
(64, 64, 96, 128) residual stages + 1x1 to 256, motion encoder, SepConvGRU(1x5/5x1),
flow head, 0.25-scaled convex-upsampling mask head) so real checkpoints port via
``lkgd_tpu.utils.porting.port_raft``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lkgd_tpu.models.unimatch import (bilinear_sample, coords_grid, instance_norm,
                                      upsample_flow_with_mask)


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    feature_dims: Tuple[int, ...] = (64, 64, 96, 128)  # conv1 + 3 residual stages
    out_dim: int = 256
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    downsample: int = 8

    @classmethod
    def large(cls) -> "RAFTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "RAFTConfig":
        return cls(feature_dims=(8, 8, 12, 16), out_dim=32, hidden_dim=16,
                   context_dim=16, corr_levels=2, corr_radius=2, iters=2)


def _batch_norm(mod: nn.Module, x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Inference-mode BatchNorm with ported running stats as frozen params."""
    c = x.shape[-1]
    scale = mod.param(f"{name}_scale", nn.initializers.ones, (c,))
    bias = mod.param(f"{name}_bias", nn.initializers.zeros, (c,))
    mean = mod.param(f"{name}_mean", nn.initializers.zeros, (c,))
    var = mod.param(f"{name}_var", nn.initializers.ones, (c,))
    inv = jax.lax.rsqrt(var + 1e-5) * scale
    return x * inv + (bias - mean * inv)


class RAFTResidualBlock(nn.Module):
    """torchvision raft.py ResidualBlock: two 3x3 convs + optional 1x1 downsample."""

    planes: int
    stride: int = 1
    norm: str = "instance"  # feature encoder: instance (no params); context: batch
    dtype: jnp.dtype = jnp.float32

    def _norm(self, x, name):
        if self.norm == "batch":
            return _batch_norm(self, x, name)
        return instance_norm(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_planes = x.shape[-1]
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(self._norm(y, "norm1"))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(self._norm(y, "norm2"))
        if self.stride != 1 or in_planes != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2, use_bias=False,
                        dtype=self.dtype, name="downsample")(x)
            x = self._norm(x, "norm3")
        return nn.relu(x + y)


class RAFTEncoder(nn.Module):
    """Feature (instance-norm) / context (batch-norm) encoder at 1/8 resolution."""

    cfg: RAFTConfig
    norm: str = "instance"
    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.cfg.feature_dims
        x = nn.Conv(d[0], (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        if self.norm == "batch":
            x = _batch_norm(self, x, "norm1")
        else:
            x = instance_norm(x)
        x = nn.relu(x)
        for stage, planes in enumerate(d[1:], start=1):
            stride = 1 if stage == 1 else 2
            x = RAFTResidualBlock(planes, stride, self.norm, self.dtype,
                                  name=f"layer{stage}_0")(x)
            x = RAFTResidualBlock(planes, 1, self.norm, self.dtype,
                                  name=f"layer{stage}_1")(x)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="conv2")(x)


def correlation_pyramid(f1: jnp.ndarray, f2: jnp.ndarray,
                        levels: int) -> Sequence[jnp.ndarray]:
    """All-pairs correlation (one MXU einsum) + average-pooled pyramid.

    f1/f2: (B, H, W, C) -> [(B*H*W, H/2^l, W/2^l, 1)] for l in [0, levels).
    Matches RAFT CorrBlock: corr / sqrt(C), pooled over the SECOND image's grid."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bxc,byc->bxy", f1.reshape(b, h * w, c),
                      f2.reshape(b, h * w, c),
                      preferred_element_type=jnp.float32) / (c ** 0.5)
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(levels - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyramid.append(corr)
    return pyramid


def lookup_correlation(pyramid: Sequence[jnp.ndarray], coords: jnp.ndarray,
                       radius: int) -> jnp.ndarray:
    """Sample (2r+1)^2 correlation values around ``coords`` at every pyramid level.

    coords: (B, H, W, 2) current matches in image-2 pixel space (x, y).
    Returns (B, H, W, levels*(2r+1)^2), level-major, x-offset-major within a level
    (RAFT corr.py: delta = stack(meshgrid(dy, dx)) added to (x, y) centroids)."""
    b, h, w, _ = coords.shape
    n = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    ox, oy = jnp.meshgrid(offs, offs, indexing="ij")  # x-offset major
    delta = jnp.stack([ox, oy], axis=-1).reshape(1, n, n, 2)
    centroid = coords.reshape(b * h * w, 1, 1, 2)
    out = []
    for lvl, corr in enumerate(pyramid):
        coords_lvl = centroid / (2.0 ** lvl) + delta  # (BHW, n, n, 2)
        sampled = bilinear_sample(corr, coords_lvl)  # (BHW, n, n, 1)
        out.append(sampled.reshape(b, h, w, n * n))
    return jnp.concatenate(out, axis=-1)


class RAFTUpdateBlock(nn.Module):
    """Motion encoder + SepConvGRU + flow head (torchvision update_block)."""

    cfg: RAFTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        dt = self.dtype
        c = nn.relu(nn.Conv(256, (1, 1), dtype=dt, name="convcorr1")(corr.astype(dt)))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=dt, name="convcorr2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=dt,
                            name="convflow1")(flow.astype(dt)))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=dt, name="convflow2")(f))
        m = nn.relu(nn.Conv(128 - 2, (3, 3), padding=1, dtype=dt, name="conv")(
            jnp.concatenate([c, f], axis=-1)))
        motion = jnp.concatenate([m, flow.astype(dt)], axis=-1)

        hid = self.cfg.hidden_dim
        x = jnp.concatenate([inp, motion], axis=-1)
        for ks, pad, suffix in (((1, 5), ((0, 0), (2, 2)), "1"),
                                ((5, 1), ((2, 2), (0, 0)), "2")):
            hx = jnp.concatenate([net, x], axis=-1)
            z = nn.sigmoid(nn.Conv(hid, ks, padding=pad, dtype=dt,
                                   name=f"convz{suffix}")(hx))
            r = nn.sigmoid(nn.Conv(hid, ks, padding=pad, dtype=dt,
                                   name=f"convr{suffix}")(hx))
            q = nn.tanh(nn.Conv(hid, ks, padding=pad, dtype=dt, name=f"convq{suffix}")(
                jnp.concatenate([r * net, x], axis=-1)))
            net = (1 - z) * net + z * q

        d = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=dt, name="flow_head_conv1")(net))
        dflow = nn.Conv(2, (3, 3), padding=1, dtype=dt, name="flow_head_conv2")(d)
        return net, dflow


class RAFT(nn.Module):
    """Full RAFT-large: returns the final convex-upsampled flow (B, H, W, 2).

    The reference consumes only ``list_of_flows[-1]`` (`utils/flow_utils.py:57-63`), so
    intermediate iterates (training supervision) are not materialized."""

    cfg: RAFTConfig = RAFTConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        fenc = RAFTEncoder(cfg, "instance", cfg.out_dim, self.dtype,
                           name="feature_encoder")
        f1 = fenc(image1)
        f2 = fenc(image2)
        pyramid = correlation_pyramid(f1, f2, cfg.corr_levels)

        ctx = RAFTEncoder(cfg, "batch", cfg.hidden_dim + cfg.context_dim, self.dtype,
                          name="context_encoder")(image1)
        net = jnp.tanh(ctx[..., :cfg.hidden_dim])
        inp = nn.relu(ctx[..., cfg.hidden_dim:])

        b, h8, w8, _ = f1.shape
        coords0 = jnp.broadcast_to(coords_grid(h8, w8)[None], (b, h8, w8, 2))
        coords1 = coords0
        update = RAFTUpdateBlock(cfg, self.dtype, name="update_block")
        for _ in range(cfg.iters):  # weights shared; unrolled at trace time
            corr = lookup_correlation(pyramid, coords1, cfg.corr_radius)
            flow = coords1 - coords0
            net, dflow = update(net, inp, corr, flow)
            coords1 = coords1 + dflow.astype(jnp.float32)

        flow = coords1 - coords0
        # 0.25-scaled mask head (torchvision MaskPredictor multiplier)
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="mask_conv1")(net))
        mask = nn.Conv(cfg.downsample ** 2 * 9, (1, 1), dtype=self.dtype,
                       name="mask_conv2")(m) * 0.25
        return upsample_flow_with_mask(flow, mask, cfg.downsample)


def raft_bidirectional_flow(params, model: RAFT, frames_a: jnp.ndarray,
                            frames_b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward+backward flow in one batched call (flow_utils.py:53-59 ``bidir=True``).

    frames in [0, 1], (B, H, W, 3) with H, W divisible by 8 (pad with
    ``lkgd_tpu.utils.optical_flow`` helpers first). Applies the torchvision transform
    (scale to [-1, 1]) internally."""
    a = frames_a * 2.0 - 1.0
    b = frames_b * 2.0 - 1.0
    img1 = jnp.concatenate([a, b], axis=0)
    img2 = jnp.concatenate([b, a], axis=0)
    flows = model.apply(params, img1, img2)
    fwd, bwd = jnp.split(flows, 2, axis=0)
    return fwd, bwd
