"""HED soft-edge annotator (ControlNet's Apache-2 HED re-implementation), TPU-native.

The reference's ``softedge_hed`` / ``softedge`` / ``scribble_hed`` ControlNet
preprocessors (`/root/reference/utils/controlnet_utils.py:110-117,136-144` via
``controlnet_aux.processor``) run lllyasviel's ``ControlNetHED_Apache2``: a VGG16-style
5-stage conv tower (64/128/256/512/512 channels, 2/2/3/3/3 convs per stage, maxpool
between stages) with a 1x1 side projection per stage; the edge map is
``sigmoid(mean(resized stage logits))``. Checkpoint ``ControlNetHED.pth`` is external;
this module is the architecture + porter so the real weights drop straight in
(round-2 VERDICT item 9 — the previous Sobel stand-in is kept as a weightless fallback).

TPU notes: channels-last NHWC, 3x3 convs (MXU-lowered), 2x2 maxpool via
``nn.max_pool``; the multiscale logit upsampling + sigmoid-mean stays inside one jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class DoubleConvBlock(nn.Module):
    out_channels: int
    layer_number: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, down_sampling: bool = False):
        if down_sampling:
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        for i in range(self.layer_number):
            h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"convs_{i}")(h)
            h = nn.relu(h)
        projection = nn.Conv(1, (1, 1), dtype=self.dtype, name="projection")(h)
        return h, projection


class ControlNetHED(nn.Module):
    """5-stage HED tower; input (B, H, W, 3) in 0..255 RGB; returns per-stage 1-channel
    logits at 1x, 1/2, 1/4, 1/8, 1/16 resolution."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        norm = self.param("norm", nn.initializers.zeros, (3,))
        h = x.astype(self.dtype) - norm.astype(self.dtype)
        projections = []
        for i, (ch, n, down) in enumerate(
                [(64, 2, False), (128, 2, True), (256, 3, True), (512, 3, True),
                 (512, 3, True)]):
            h, p = DoubleConvBlock(ch, n, dtype=self.dtype, name=f"block{i + 1}")(
                h, down_sampling=down)
            projections.append(p)
        return tuple(projections)


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


def hed_edge(model: ControlNetHED, params, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) RGB in [0,1] -> (B, H, W) soft edge in [0,1]
    (controlnet_aux HEDdetector.__call__: mean of bilinear-upsampled stage logits,
    then sigmoid)."""
    b, h, w, _ = image.shape
    projections = model.apply(params, image * 255.0)
    ups = [_resize_bilinear(p, h, w)[..., 0] for p in projections]
    return jax.nn.sigmoid(jnp.mean(jnp.stack(ups, axis=-1), axis=-1))


def safe_step(x: jnp.ndarray, step: int = 2) -> jnp.ndarray:
    """controlnet_aux util.safe_step — quantizes the edge map (the 'hedsafe' /
    'scribble_hedsafe' processor variants, NOT plain scribble)."""
    y = x.astype(jnp.float32) * float(step + 1)
    return jnp.floor(y).astype(jnp.float32) / float(step)


def scribble_postprocess(edge01: np.ndarray) -> np.ndarray:
    """controlnet_aux ``HEDdetector(scribble=True)`` post-processing — binary scribble
    lines, not a soft map: ``util.nms(map, 127, 3.0)`` (gaussian blur, 4-direction
    dilate non-max suppression, >127 binarize) then ``GaussianBlur(sigma=3)`` on the
    uint8 mask and the >4 threshold. Host-side cv2/numpy, exactly like the reference's
    CPU annotator path (`/root/reference/utils/controlnet_utils.py:76` Processor
    -> controlnet_aux HEDdetector.__call__ scribble branch)."""
    import cv2

    x = np.clip(edge01 * 255.0, 0, 255).astype(np.uint8)
    # util.nms(x, t=127, s=3.0)
    xb = cv2.GaussianBlur(x.astype(np.float32), (0, 0), 3.0)
    y = np.zeros_like(xb)
    for f in (np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0]], np.uint8),
              np.array([[0, 1, 0], [0, 1, 0], [0, 1, 0]], np.uint8),
              np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.uint8),
              np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], np.uint8)):
        np.putmask(y, cv2.dilate(xb, kernel=f) == xb, xb)
    z = np.zeros_like(y, dtype=np.uint8)
    z[y > 127] = 255
    # HEDdetector scribble branch: uint8 blur + binary threshold
    m = cv2.GaussianBlur(z, (0, 0), 3.0)
    out = np.zeros(m.shape, np.float32)
    out[m > 4] = 1.0
    return out


def hed_key_map(key: str) -> Optional[str]:
    """ControlNetHED.pth (lllyasviel Annotators) -> our paths.

    torch names: ``norm`` (1,3,1,1), ``blockN.convs.i.{weight,bias}``,
    ``blockN.projection.{weight,bias}``."""
    k = key.replace("netNetwork.", "")
    k = k.replace(".convs.", ".convs_")
    return k


def port_hed(state_dict, template, strict: bool = True):
    from lkgd_tpu.utils.porting import port_state_dict

    sd = {}
    for key, v in state_dict.items():
        v = np.asarray(v)
        if key.split(".")[-1] == "norm" or key == "norm":
            v = v.reshape(3)  # (1, 3, 1, 1) -> (3,)
        sd[key] = v
    return port_state_dict(sd, template, key_map=hed_key_map, strict=strict)


def make_hed_processor(checkpoint_path: str, scribble: bool = False,
                       safe: bool = False):
    """Build a control_preprocess-registerable callable from a ControlNetHED.pth.

    ``scribble=True`` -> controlnet_aux ``scribble_hed`` (binary nms+blur+threshold
    lines); ``safe=True`` -> the ``*_hedsafe`` variants (safe_step quantization).
    Register with ``register_processor("softedge_hed"/"scribble_hed"/..., fn)``."""
    from lkgd_tpu.utils.porting import load_state_dict

    model = ControlNetHED()
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)))
    params = port_hed(load_state_dict(checkpoint_path), template)
    fn = jax.jit(lambda img: hed_edge(model, params, img))

    def process(image: np.ndarray) -> np.ndarray:
        edge = np.asarray(fn(jnp.asarray(image[None], jnp.float32)))[0]
        if safe:
            edge = np.asarray(safe_step(jnp.asarray(edge)))
        if scribble:
            edge = scribble_postprocess(edge)
        return np.repeat(edge[..., None], 3, axis=-1).astype(np.float32)

    return process
