"""Latent-knowledge fusion — the LKGD conditioning block, TPU-native.

Re-implements the quaternion + rFFT fusion the reference adds to the SVD UNet
(`/root/reference/models/unet_spatio_temporal_condition.py:197-225,536-595`) and to the
CogVideoX DiT (`CogVideo-main/finetune/models/cogvideox_i2v/cogvideox_transformer_3d.py:337-366`):

  1. Three depthwise 4→1 channel compressors (Conv1d(ctx_dim→256, k=1, groups=256)) reduce the
     CLIP/T5 context, the domain-MAE feature, and the flow-MAE feature to 256-d tokens.
  2. Spatial branch: a QuaternionLinear(1024→512) fuses [clip, domain, flow, learnable-ctx].
  3. Spectral branch: rFFT(256)→129 bins; magnitudes and phases of the first 128 bins of each
     stream (+ learnable spectral contexts) are fused by QuaternionLinear(512→256) each; the
     Nyquist bin by Linear(4→1); the fused spectrum is inverted with irFFT → 512 reals.
  4. A 2-layer MLP (1024→256→LeakyReLU(0.1)→1024) recombines both branches into the final
     cross-attention context.

Everything is a handful of small matmuls + a length-256 rFFT — it stays in plain XLA (the
FFT is far too small to benefit from a hand-written kernel; see SURVEY.md §7 "FFT fusion").
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from lkgd_tpu.ops.quaternion import QuaternionLinear
from lkgd_tpu.ops.real_fft import irfft_real, rfft_real


def interpolate_linear_1d(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Resize the last axis with linear interpolation, matching
    ``torch.nn.functional.interpolate(mode="linear", align_corners=False)``
    (used at reference unet :537,540 to stretch MAE features to 1024)."""
    in_size = x.shape[-1]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, in_size - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (coords - lo.astype(jnp.float32)).astype(x.dtype)
    return x[..., lo] * (1.0 - w) + x[..., hi] * w


class DepthwiseCompressor(nn.Module):
    """Conv1d(in_dim → in_dim//4, kernel=1, groups=in_dim//4, bias=False): a learned 4→1
    pooling over contiguous channel groups (reference unet :197-211)."""

    in_dim: int = 1024
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_dim = self.out_dim or self.in_dim // 4
        group = self.in_dim // out_dim
        # torch Conv1d weight (out_dim, group, 1); group o consumes channels [g*o, g*(o+1))
        w = self.param("weight", nn.initializers.lecun_normal(), (out_dim, group))
        xg = x.reshape(x.shape[:-1] + (out_dim, group)).astype(self.dtype)
        return jnp.einsum("...og,og->...o", xg, w.astype(self.dtype))


class LatentKnowledgeFusion(nn.Module):
    """Fuse CLIP/T5 context with domain & flow MAE features (reference unet :536-595).

    Call with ``context`` (B, L, ctx_dim) and optional ``domain``/``flow`` (B, L, any_dim);
    absent knowledge features default to zeros (matching a model run without them).
    Returns a tensor of the same shape as ``context``.
    """

    ctx_dim: int = 1024
    knowledge_dim: Optional[int] = None  # interpolation target for MAE features; default ctx_dim
    compress_dim: Optional[int] = None  # d; default ctx_dim // 4 (SVD 256; CogVideoX fixes 256)
    sf_hidden: Optional[int] = None  # recombine MLP hidden; default d (CogVideoX uses 512)
    zero_init_output: bool = False  # CogVideoX zero-inits the last recombine linear
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context: jnp.ndarray, domain: Optional[jnp.ndarray] = None,
                 flow: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = self.compress_dim or self.ctx_dim // 4  # 256 for SVD's 1024-d CLIP context
        n_bins = d // 2 + 1  # 129 rfft bins

        kdim = self.knowledge_dim or self.ctx_dim
        lconv = DepthwiseCompressor(self.ctx_dim, out_dim=d, dtype=self.dtype, name="lconv")
        dconv = DepthwiseCompressor(kdim, out_dim=d, dtype=self.dtype, name="dconv")
        fconv = DepthwiseCompressor(kdim, out_dim=d, dtype=self.dtype, name="fconv")

        lh = lconv(context)  # (B, L, d)
        if domain is None:
            domain = jnp.zeros(context.shape[:-1] + (kdim,), context.dtype)
        if flow is None:
            flow = jnp.zeros(context.shape[:-1] + (kdim,), context.dtype)
        ld = dconv(interpolate_linear_1d(domain, kdim))
        lf = fconv(interpolate_linear_1d(flow, kdim))
        if ld.shape[1] != lh.shape[1] and ld.shape[1] == 1:
            # broadcast single knowledge token over all context tokens (CogVideoX T5 ctx,
            # reference cogvideox_transformer_3d.py:527-529)
            ld = jnp.broadcast_to(ld, lh.shape)
            lf = jnp.broadcast_to(lf, lh.shape)
        if ld.shape[0] != lh.shape[0] and ld.shape[0] == 1:
            # CFG-doubled context with un-doubled knowledge features (reference :544-546)
            ld = jnp.concatenate([ld, ld], axis=0)
            lf = jnp.concatenate([lf, lf], axis=0)

        ctx_learn = self.param("texts", nn.initializers.zeros, (d,)).astype(lh.dtype)
        ctx_learn = jnp.broadcast_to(ctx_learn, lh.shape)

        # --- spatial branch
        fuse = QuaternionLinear(4 * d, 2 * d, dtype=self.dtype, name="fuse")
        spatial = fuse(jnp.concatenate([lh, ld, lf, ctx_learn], axis=-1))  # (B, L, 2d)

        # --- spectral branch. No complex dtypes: the TPU backend lacks them, so the rFFT
        # is a real cos/sin DFT matmul (lkgd_tpu.ops.real_fft) — exact and MXU-friendly at N=256.
        mags, phas = [], []
        for t in (lh, ld, lf):
            re, im = rfft_real(t)
            mag2 = re * re + im * im
            # grad-safe magnitude/phase: sqrt and arctan2 have NaN gradients at the
            # origin (zero bins occur for constant feature vectors — e.g. fully-masked
            # conditioning); guard with eps / branch-safe where
            mags.append(jnp.sqrt(mag2 + 1e-20))
            safe = mag2 > 1e-20
            re_s = jnp.where(safe, re, 1.0)
            im_s = jnp.where(safe, im, 0.0)
            phas.append(jnp.arctan2(im_s, re_s))
        ctx_mag = jnp.broadcast_to(
            self.param("texts_fft_mag", nn.initializers.zeros, (n_bins,)), mags[0].shape)
        ctx_pha = jnp.broadcast_to(
            self.param("texts_fft_pha", nn.initializers.zeros, (n_bins,)), phas[0].shape)
        mags.append(ctx_mag)
        phas.append(ctx_pha)

        fuse_mag = QuaternionLinear(2 * d, d, dtype=jnp.float32, name="fuse_fft_mag")
        fuse_pha = QuaternionLinear(2 * d, d, dtype=jnp.float32, name="fuse_fft_pha")
        mag = fuse_mag(jnp.concatenate([m[..., :-1] for m in mags], axis=-1))  # (B, L, d)
        pha = fuse_pha(jnp.concatenate([p[..., :-1] for p in phas], axis=-1))
        spec_re = mag * jnp.cos(pha)
        spec_im = mag * jnp.sin(pha)

        # Nyquist bin: 4 scalars -> 1 (reference :576-580)
        mag0_in = jnp.stack([m[..., -1] for m in mags], axis=-1)  # (B, L, 4)
        pha0_in = jnp.stack([p[..., -1] for p in phas], axis=-1)
        mag0 = nn.Dense(1, dtype=jnp.float32, name="fuse_fft_mag0")(mag0_in)
        pha0 = nn.Dense(1, dtype=jnp.float32, name="fuse_fft_pha0")(pha0_in)

        spec_re = jnp.concatenate([spec_re, mag0 * jnp.cos(pha0)], axis=-1)  # (B, L, d+1)
        spec_im = jnp.concatenate([spec_im, mag0 * jnp.sin(pha0)], axis=-1)
        spectral = irfft_real(spec_re, spec_im).astype(spatial.dtype)  # (B, L, 2d)

        # --- recombine (reference :219-222,595)
        h = jnp.concatenate([spatial, spectral], axis=-1)  # (B, L, 4d)
        h = nn.Dense(self.sf_hidden or d, dtype=self.dtype, name="fuse_sf_0")(h)
        h = nn.leaky_relu(h, negative_slope=0.1)
        out_init = nn.initializers.zeros if self.zero_init_output else (
            nn.initializers.lecun_normal())
        return nn.Dense(self.ctx_dim, dtype=self.dtype, kernel_init=out_init,
                        name="fuse_sf_2")(h)
