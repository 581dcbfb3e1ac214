"""Lineart-anime annotator (Anime2Sketch pix2pix U-Net generator).

The reference's ``lineart_anime`` ControlNet preprocessor
(`/root/reference/utils/controlnet_utils.py:119-121,136` via
``controlnet_aux.processor.Processor('lineart_anime')``) runs the Anime2Sketch
``UnetGenerator(3, 1, num_downs=8, ngf=64, norm_layer=InstanceNorm2d)`` and returns a
1-channel sketch (dark lines on white). Checkpoint weights (``netG.pth``) are external;
this module is the TPU-native architecture plus a porter keyed to the exact pix2pix
recursive ``model.model...`` state-dict naming, so real weights drop straight in.

TPU design notes: channels-last NHWC; InstanceNorm (affine=False) is a per-sample
spatial-mean/var normalization fused by XLA; stride-2 4x4 convs down, 4x4
ConvTranspose up (MXU-friendly static shapes). The whole generator jits as one program
— no recursion at trace time beyond Python module construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LineartAnimeConfig:
    in_channels: int = 3
    out_channels: int = 1
    num_downs: int = 8
    ngf: int = 64


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False): normalize each (sample, channel) plane."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class _SkipBlock(nn.Module):
    """One pix2pix U-Net level: down 4x4/s2 conv -> submodule -> up 4x4/s2 convT,
    with channel-concat skip (outer levels) — Anime2Sketch ``UnetSkipConnectionBlock``."""

    outer_nc: int
    inner_nc: int
    submodule: Optional["_SkipBlock"]
    outermost: bool = False
    innermost: bool = False
    input_nc: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x if self.outermost else nn.leaky_relu(x, 0.2)
        h = nn.Conv(self.inner_nc, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="down")(h)
        if not (self.outermost or self.innermost):
            h = _instance_norm(h)
        if self.submodule is not None:
            h = self.submodule(h)
        h = nn.relu(h)
        # torch ConvTranspose2d(k=4, s=2, p=1) == lax conv_transpose with padding
        # k-1-p = 2 on the stride-dilated input + flipped kernel (transpose_kernel)
        h = nn.ConvTranspose(self.outer_nc, (4, 4), strides=(2, 2),
                             padding=((2, 2), (2, 2)), transpose_kernel=True,
                             dtype=self.dtype, name="up")(h)
        if self.outermost:
            return jnp.tanh(h)
        h = _instance_norm(h)
        return jnp.concatenate([x, h], axis=-1)


class LineartAnimeGenerator(nn.Module):
    """(B, H, W, 3) in [-1, 1] -> (B, H, W, 1) sketch in [-1, 1] (white background ~1,
    dark lines ~ -1). H and W must be multiples of 2**num_downs (the detector pads
    input to a 256-multiple)."""

    config: LineartAnimeConfig = LineartAnimeConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        ngf, n = cfg.ngf, cfg.num_downs
        block = _SkipBlock(ngf * 8, ngf * 8, None, innermost=True, dtype=self.dtype,
                           name=f"level_{n - 1}")
        for i in range(n - 5):  # (num_downs - 5) middle ngf*8 -> ngf*8 levels
            block = _SkipBlock(ngf * 8, ngf * 8, block, dtype=self.dtype,
                               name=f"level_{n - 2 - i}")
        block = _SkipBlock(ngf * 4, ngf * 8, block, dtype=self.dtype, name="level_3")
        block = _SkipBlock(ngf * 2, ngf * 4, block, dtype=self.dtype, name="level_2")
        block = _SkipBlock(ngf, ngf * 2, block, dtype=self.dtype, name="level_1")
        self.model = _SkipBlock(cfg.out_channels, ngf, block, outermost=True,
                                input_nc=cfg.in_channels, dtype=self.dtype,
                                name="level_0")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.model(x)


# ------------------------------------------------------------------ porting
def _torch_key(level: int, num_downs: int, updown: str) -> str:
    """State-dict key prefix of the down/up conv at recursion ``level`` in the pix2pix
    ``UnetGenerator`` Sequential nesting (0 = outermost).

    Sequential layouts per block type (InstanceNorm affine=False holds no params but
    occupies an index):
      outermost: [downconv 0, submodule 1, uprelu 2, upconv 3, tanh 4]
      middle:    [downrelu 0, downconv 1, downnorm 2, submodule 3, uprelu 4, upconv 5,
                  upnorm 6]
      innermost: [downrelu 0, downconv 1, uprelu 2, upconv 3, upnorm 4]
    """
    parts = ["model"]
    for lv in range(level):
        parts.append("model.1" if lv == 0 else "model.3")
    innermost = level == num_downs - 1
    if level == 0:
        idx = 0 if updown == "down" else 3
    elif innermost:
        idx = 1 if updown == "down" else 3
    else:
        idx = 1 if updown == "down" else 5
    parts.append(f"model.{idx}")
    return ".".join(parts)


def port_lineart_anime(state_dict, config: LineartAnimeConfig = LineartAnimeConfig()):
    """Torch ``netG`` state dict (numpy arrays, ``module.`` prefix stripped) -> flax
    params for :class:`LineartAnimeGenerator`.

    Conv2d weights (O, I, kH, kW) -> (kH, kW, I, O). ConvTranspose2d weights
    (I, O, kH, kW) -> (kH, kW, O, I), consumed with ``transpose_kernel=True`` which
    reproduces torch's gradient-of-conv semantics exactly (verified against a torch
    oracle in tests/test_lineart_anime.py)."""
    params: dict = {}
    for level in range(config.num_downs):
        # all levels are constructed in setup() -> sibling scopes level_0..level_{n-1}
        scope = params.setdefault(f"level_{level}", {})
        for updown in ("down", "up"):
            key = _torch_key(level, config.num_downs, updown)
            w = np.asarray(state_dict[f"{key}.weight"], np.float32)
            b = np.asarray(state_dict[f"{key}.bias"], np.float32)
            # down: (O,I,kh,kw) -> (kh,kw,I,O); up: (I,O,kh,kw) -> (kh,kw,O,I) — the
            # same permutation, consumed by transpose_kernel=True on the up side
            kernel = np.transpose(w, (2, 3, 1, 0))
            scope[updown] = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}
    return {"params": params}


def make_lineart_anime_processor(params, config: LineartAnimeConfig = LineartAnimeConfig(),
                                 invert: bool = False):
    """Build a ``register_processor``-compatible callable: [0,1] (H,W,3) -> [0,1]
    (H,W,3) sketch (white bg, dark lines; ``invert=True`` flips to ControlNet's
    white-lines-on-black convention). Pads H/W up to the 2**num_downs multiple and
    crops back, mirroring the detector's 256-multiple resize."""
    model = LineartAnimeGenerator(config)
    mult = 2 ** config.num_downs

    @jax.jit
    def run(x):
        return model.apply(params, x)

    def processor(image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        ph, pw = -h % mult, -w % mult
        x = np.pad(image * 2.0 - 1.0, ((0, ph), (0, pw), (0, 0)), mode="edge")
        out = np.asarray(run(jnp.asarray(x, np.float32)[None]))[0, :h, :w, 0]
        out = np.clip(out / 2.0 + 0.5, 0.0, 1.0)
        if invert:
            out = 1.0 - out
        return np.repeat(out[..., None], 3, axis=-1).astype(np.float32)

    return processor
