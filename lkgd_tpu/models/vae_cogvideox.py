"""CogVideoX causal 3D VAE — TPU-native.

Re-implements diffusers' ``AutoencoderKLCogVideoX`` (the VAE behind the reference's
CogVideoX pipelines and the latent pre-computation at
`CogVideo-main/finetune/datasets/i2v_dataset.py:102-124`): causal 3D convolutions
(temporal front-padding with the replicated first frame), spatial 2x down/up at every
level, 4x temporal compression, per-frame group norms.

Layout: videos (B, T, H, W, C) channels-last. Latent frames = (T - 1)/4 + 1 (the first
frame is never temporally compressed — the causal convs see it alone).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lkgd_tpu.models.layers import GroupNorm


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    temporal_compress_levels: Tuple[bool, ...] = (True, True, False)  # per downsample
    scaling_factor: float = 0.7

    @classmethod
    def tiny(cls) -> "CogVideoXVAEConfig":
        return cls(latent_channels=4, block_out_channels=(32, 32, 64), layers_per_block=1,
                   temporal_compress_levels=(True, True))


class CausalConv3d(nn.Module):
    """3D conv with causal temporal padding: the time axis is front-padded with the first
    frame (replicate) so frame t never sees the future.

    ``cache_mode`` enables chunked streaming decode (the diffusers conv-cache /
    "fake context parallel" frame batching the reference serves with):
      * None    — whole-clip call, no cache touched
      * "first" — replicate-pad (clip start) and store the last kt-1 input frames in
                  the flax "cache" collection
      * "cont"  — front-pad from the cache (exact temporal continuation) and update it
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)  # (T, H, W)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cache_mode: str | None = None) -> jnp.ndarray:
        kt, kh, kw = self.kernel
        st, sh, sw = self.strides
        if kt > 1:
            if cache_mode is None:
                x = jnp.concatenate([jnp.repeat(x[:, :1], kt - 1, axis=1), x], axis=1)
            else:
                cache = self.variable(
                    "cache", "past", lambda: jnp.repeat(x[:, :1], kt - 1, axis=1))
                front = (cache.value if cache_mode == "cont"
                         else jnp.repeat(x[:, :1], kt - 1, axis=1))
                x = jnp.concatenate([front, x], axis=1)
                cache.value = x[:, -(kt - 1):]
        pad_h = ((kh - 1) // 2, kh // 2)
        pad_w = ((kw - 1) // 2, kw // 2)
        return nn.Conv(self.features, (kt, kh, kw), strides=(st, sh, sw),
                       padding=((0, 0), pad_h, pad_w), dtype=self.dtype, name="conv")(x)


class CogResBlock3D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cache_mode: str | None = None) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm(32, 1e-6, dtype=self.dtype, act="silu", name="norm1")(x)
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv1")(h, cache_mode)
        h = GroupNorm(32, 1e-6, dtype=self.dtype, act="silu", name="norm2")(h)
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv2")(h, cache_mode)
        if in_ch != self.out_channels:
            x = CausalConv3d(self.out_channels, kernel=(1, 1, 1), dtype=self.dtype,
                             name="conv_shortcut")(x)
        return x + h


def _temporal_downsample(x: jnp.ndarray, clip_start: bool = True) -> jnp.ndarray:
    """Causal 2x temporal pooling: keep frame 0, average-pool pairs of the rest
    (CogVideoX keeps the first frame uncompressed). ``clip_start=False`` for
    continuation chunks of a streaming encode, where every frame pairs normally."""
    if not clip_start:
        t = x.shape[1]
        xe = x[:, : t - t % 2]
        return xe.reshape(xe.shape[0], -1, 2, *xe.shape[2:]).mean(axis=2)
    first, rest = x[:, :1], x[:, 1:]
    t = rest.shape[1]
    rest = rest[:, : t - t % 2]
    rest = rest.reshape(rest.shape[0], -1, 2, *rest.shape[2:]).mean(axis=2)
    return jnp.concatenate([first, rest], axis=1)


def _temporal_upsample(x: jnp.ndarray, clip_start: bool = True) -> jnp.ndarray:
    """2x temporal upsample; the clip's true first frame stays unexpanded (CogVideoX's
    uncompressed-first-frame convention). ``clip_start=False`` for continuation chunks
    of a streaming decode, where every frame is a 'rest' frame."""
    if not clip_start:
        return jnp.repeat(x, 2, axis=1)
    first, rest = x[:, :1], x[:, 1:]
    rest = jnp.repeat(rest, 2, axis=1)
    return jnp.concatenate([first, rest], axis=1)


def _spatial_resize(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    b, t, h, w, c = x.shape
    return jax.image.resize(x, (b, t, int(h * scale), int(w * scale), c), "nearest")


class CogVideoXEncoder(nn.Module):
    config: CogVideoXVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cache_mode: str | None = None) -> jnp.ndarray:
        cfg = self.config
        h = CausalConv3d(cfg.block_out_channels[0], dtype=self.dtype,
                         name="conv_in")(x, cache_mode)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = CogResBlock3D(ch, dtype=self.dtype, name=f"down_{i}_res_{j}")(h, cache_mode)
            if i < len(cfg.block_out_channels) - 1:
                b, t, hh, ww, c = h.shape
                h = h.reshape(b * t, hh, ww, c)
                h = nn.Conv(c, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                            name=f"down_{i}_downsample")(h)
                h = h.reshape(b, t, hh // 2, ww // 2, c)
                if cfg.temporal_compress_levels[i]:
                    h = _temporal_downsample(h, clip_start=cache_mode != "cont")
        h = CogResBlock3D(cfg.block_out_channels[-1], dtype=self.dtype,
                          name="mid_res_0")(h, cache_mode)
        h = CogResBlock3D(cfg.block_out_channels[-1], dtype=self.dtype,
                          name="mid_res_1")(h, cache_mode)
        h = GroupNorm(32, 1e-6, dtype=self.dtype, act="silu", name="norm_out")(h)
        return CausalConv3d(2 * cfg.latent_channels, dtype=self.dtype,
                            name="conv_out")(h, cache_mode)


class CogVideoXDecoder(nn.Module):
    config: CogVideoXVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, cache_mode: str | None = None) -> jnp.ndarray:
        cfg = self.config
        chs = tuple(reversed(cfg.block_out_channels))
        h = CausalConv3d(chs[0], dtype=self.dtype, name="conv_in")(z, cache_mode)
        h = CogResBlock3D(chs[0], dtype=self.dtype, name="mid_res_0")(h, cache_mode)
        h = CogResBlock3D(chs[0], dtype=self.dtype, name="mid_res_1")(h, cache_mode)
        t_levels = tuple(reversed(cfg.temporal_compress_levels))
        for i, ch in enumerate(chs):
            for j in range(cfg.layers_per_block):
                h = CogResBlock3D(ch, dtype=self.dtype, name=f"up_{i}_res_{j}")(h, cache_mode)
            if i < len(chs) - 1:
                if t_levels[i]:
                    h = _temporal_upsample(h, clip_start=cache_mode != "cont")
                h = _spatial_resize(h, 2.0)
                b, t, hh, ww, c = h.shape
                h2 = h.reshape(b * t, hh, ww, c)
                h2 = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                             name=f"up_{i}_upsample")(h2)
                h = h2.reshape(b, t, hh, ww, c)
        h = GroupNorm(32, 1e-6, dtype=self.dtype, act="silu", name="norm_out")(h)
        return CausalConv3d(cfg.out_channels, dtype=self.dtype, name="conv_out")(h, cache_mode)


class AutoencoderKLCogVideoX(nn.Module):
    config: CogVideoXVAEConfig = CogVideoXVAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = CogVideoXEncoder(self.config, dtype=self.dtype)
        self.decoder = CogVideoXDecoder(self.config, dtype=self.dtype)

    def encode_mode(self, x: jnp.ndarray, cache_mode: str | None = None) -> jnp.ndarray:
        """(B, T, H, W, 3) -> (B, T_lat, h, w, latent) posterior mean."""
        return self.encoder(x, cache_mode)[..., : self.config.latent_channels]

    def decode(self, z: jnp.ndarray, cache_mode: str | None = None) -> jnp.ndarray:
        return self.decoder(z, cache_mode)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode_mode(x))


@functools.lru_cache(maxsize=None)
def _decode_fns(vae: AutoencoderKLCogVideoX):
    """Jitted decode entry points, cached per module config so tile/chunk loops reuse
    one compilation per shape."""
    fn_plain = jax.jit(lambda p, zc: vae.apply(
        p, zc, method=AutoencoderKLCogVideoX.decode))
    fn_first = jax.jit(lambda p, zc: vae.apply(
        p, zc, "first", mutable=["cache"], method=AutoencoderKLCogVideoX.decode))
    fn_cont = jax.jit(lambda p, zc: vae.apply(
        p, zc, "cont", mutable=["cache"], method=AutoencoderKLCogVideoX.decode))
    return fn_plain, fn_first, fn_cont


def chunked_decode(vae: AutoencoderKLCogVideoX, params, z: jnp.ndarray, *,
                   chunk_latent_frames: int = 2) -> jnp.ndarray:
    """Streaming temporal decode in small latent-frame chunks — the diffusers
    ``num_latent_frames_batch_size`` frame batching the reference's CogVideoX serving
    relies on (``CogVideo-main/inference/cli_demo.py:163`` enable_slicing/tiling stack):
    peak decoder activation HBM is bounded by the chunk, not the clip.

    Temporal continuity across chunks is EXACT for every causal conv (the flax "cache"
    collection carries the last kt-1 input frames per conv, the diffusers conv_cache
    analog); GroupNorm statistics are per-chunk, exactly as in diffusers' chunked
    decode. The first chunk absorbs the clip's uncompressed first frame plus the
    remainder so continuation chunks share ONE compiled shape.
    """
    t = z.shape[1]
    first = ((t - 1) % chunk_latent_frames) + 1
    _, fn_first, fn_cont = _decode_fns(vae)
    frames, mut = fn_first(params, z[:, :first])
    outs = [frames]
    for idx in range(first, t, chunk_latent_frames):
        frames, mut = fn_cont({**params, "cache": mut["cache"]},
                              z[:, idx:idx + chunk_latent_frames])
        outs.append(frames)
    return jnp.concatenate(outs, axis=1)


@functools.lru_cache(maxsize=None)
def _encode_fns(vae: AutoencoderKLCogVideoX):
    fn_plain = jax.jit(lambda p, xc: vae.apply(
        p, xc, method=AutoencoderKLCogVideoX.encode_mode))
    fn_first = jax.jit(lambda p, xc: vae.apply(
        p, xc, "first", mutable=["cache"], method=AutoencoderKLCogVideoX.encode_mode))
    fn_cont = jax.jit(lambda p, xc: vae.apply(
        p, xc, "cont", mutable=["cache"], method=AutoencoderKLCogVideoX.encode_mode))
    return fn_plain, fn_first, fn_cont


def chunked_encode(vae: AutoencoderKLCogVideoX, params, x: jnp.ndarray, *,
                   chunk_frames: int = 8) -> jnp.ndarray:
    """Streaming encode in pixel-frame chunks (diffusers frame batching on the encode
    side — the reference's v2v / latent-precompute path at scale). Conv caches make
    temporal continuity exact; GroupNorm stats are per-chunk as in diffusers.
    ``chunk_frames`` must be a multiple of the total temporal compression so every
    chunk pools into whole latent frames."""
    t = x.shape[1]
    compress = 2 ** sum(vae.config.temporal_compress_levels)
    if chunk_frames % compress:
        raise ValueError(f"chunk_frames {chunk_frames} not a multiple of the "
                         f"{compress}x temporal compression")
    first = ((t - 1) % chunk_frames) + 1
    _, fn_first, fn_cont = _encode_fns(vae)
    z, mut = fn_first(params, x[:, :first])
    outs = [z]
    for idx in range(first, t, chunk_frames):
        z, mut = fn_cont({**params, "cache": mut["cache"]},
                         x[:, idx:idx + chunk_frames])
        outs.append(z)
    return jnp.concatenate(outs, axis=1)


def tiled_encode(vae: AutoencoderKLCogVideoX, params, x: jnp.ndarray, *,
                 tile_height: int = 480, tile_width: int = 720,
                 overlap: float = 0.25,
                 chunk_frames: int | None = None) -> jnp.ndarray:
    """Spatially tiled encode with latent-space blend ramps (diffusers
    ``tiled_encode``); composes with :func:`chunked_encode` per tile."""
    b, t, h, w, c = x.shape
    s = 2 ** (len(vae.config.block_out_channels) - 1)

    if chunk_frames:
        def encode(p, xt):
            return chunked_encode(vae, p, xt, chunk_frames=chunk_frames)
    else:
        encode = _encode_fns(vae)[0]

    out = _tiled_apply(lambda xt: encode(params, xt), x,
                       tile_height, tile_width, overlap,
                       to_out=lambda p: p // s, align=s)
    assert out.shape[2:] == (h // s, w // s, vae.config.latent_channels), out.shape
    return out


def _blend_ramp(n: int, dtype) -> jnp.ndarray:
    """0..1 linear ramp of length n (diffusers AutoencoderKLCogVideoX.blend_v/h:
    b[y] = a[-n+y] * (1 - y/n) + b[y] * (y/n))."""
    return (jnp.arange(n, dtype=dtype) / n)


def _tiled_apply(fn, x: jnp.ndarray, th: int, tw: int, overlap: float, to_out,
                 align: int = 1) -> jnp.ndarray:
    """Shared tile-grid + blend-ramp stitcher for tiled_decode/tiled_encode.

    ``fn(tile)`` maps an input tile to an output tile; ``to_out`` converts an input
    spatial coordinate to the output grid (``p * s`` for decode, ``p // s`` for
    encode). ``align`` constrains tile sizes/starts to multiples of s on the encode
    side so latent coordinates stay integral. All tiles share one shape (edge tiles
    are index-shifted inward, never shrunk); seams blend with linear ramps.
    """
    h, w = x.shape[2], x.shape[3]
    if align > 1 and (h % align or w % align):
        raise ValueError(f"frame {h}x{w} must be a multiple of {align} for tiling")
    th, tw = min(th, h), min(tw, w)
    th -= th % align
    tw -= tw % align
    stride_h = max(align, (int(th * (1 - overlap)) // align) * align)
    stride_w = max(align, (int(tw * (1 - overlap)) // align) * align)

    def starts(dim, tile, stride):
        out = list(range(0, max(dim - tile, 0) + 1, stride))
        if out[-1] + tile < dim:
            out.append(dim - tile)  # multiple of `align` because dim and tile are
        return out

    out = None
    for i in starts(h, th, stride_h):
        row = None
        for j in starts(w, tw, stride_w):
            tile = fn(x[:, :, i:i + th, j:j + tw])
            if row is None:
                row = tile
            else:
                ov = row.shape[3] - to_out(j)  # overlap width on the output grid
                ramp = _blend_ramp(ov, tile.dtype)[None, None, None, :, None]
                blended = (row[:, :, :, row.shape[3] - ov:] * (1 - ramp)
                           + tile[:, :, :, :ov] * ramp)
                row = jnp.concatenate(
                    [row[:, :, :, :row.shape[3] - ov], blended, tile[:, :, :, ov:]],
                    axis=3)
        if out is None:
            out = row
        else:
            ov = out.shape[2] - to_out(i)
            ramp = _blend_ramp(ov, row.dtype)[None, None, :, None, None]
            blended = (out[:, :, out.shape[2] - ov:] * (1 - ramp)
                       + row[:, :, :ov] * ramp)
            out = jnp.concatenate(
                [out[:, :, :out.shape[2] - ov], blended, row[:, :, ov:]], axis=2)
    return out


def tiled_decode(vae: AutoencoderKLCogVideoX, params, z: jnp.ndarray, *,
                 tile_latent_height: int = 60, tile_latent_width: int = 90,
                 overlap: float = 0.25,
                 chunk_latent_frames: int | None = None) -> jnp.ndarray:
    """Spatially tiled decode — the reference's ``vae.enable_tiling()`` serving path
    (diffusers AutoencoderKLCogVideoX.tiled_decode, used by the reference
    ``CogVideo-main/inference/cli_demo.py:164``): the latent grid is decoded in
    overlapping tiles and seams are hidden with linear blend ramps, bounding peak
    activation HBM by the tile size instead of the full frame.

    All tiles share one shape, so XLA compiles the decoder ONCE and the Python tile
    loop replays it (right/bottom edge tiles are index-shifted inward, never shrunk —
    the overlap blending absorbs the duplicated strip).
    """
    b, t, h, w, c = z.shape
    # output scale factor, probed from the config (spatial 2x per level below the top)
    s = 2 ** (len(vae.config.block_out_channels) - 1)

    if chunk_latent_frames:
        def decode(p, zt):
            return chunked_decode(vae, p, zt, chunk_latent_frames=chunk_latent_frames)
    else:
        decode = _decode_fns(vae)[0]

    out = _tiled_apply(lambda zt: decode(params, zt), z,
                       tile_latent_height, tile_latent_width, overlap,
                       to_out=lambda p: p * s)
    assert out.shape[2:] == (h * s, w * s, vae.config.out_channels), out.shape
    return out
