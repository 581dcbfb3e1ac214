"""Flow estimation wrappers around the TPU UniMatch model.

Mirrors `/root/reference/utils/optical_flow.py:108-305`: resize frames to a multiple of
the padding factor, run UniMatch on consecutive frame pairs (optionally bidirectionally),
resize the flow back with component rescaling. Pure JAX; the frame-pair axis is just batch,
so the whole video's flow computes in one jitted call (the reference chunks by 4 pairs for
GPU memory — unnecessary here, but ``chunk_pairs`` is kept for parity on small HBM).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from lkgd_tpu.models.unimatch import UniMatch

FLOW_MEAN = -0.010683227330446243  # reference utils/optical_flow.py:11
FLOW_STD = 5.01635217666626
PADDING_FACTOR = 16


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


def make_flow_fn(model: UniMatch, params, image_hw: Tuple[int, int]):
    """Returns a jitted fn: frames (T, H, W, 3) in [0,1] -> forward flow (T-1, H, W, 2)."""
    H, W = image_hw
    ph = -(-H // PADDING_FACTOR) * PADDING_FACTOR
    pw = -(-W // PADDING_FACTOR) * PADDING_FACTOR

    @jax.jit
    def flow_fn(frames: jnp.ndarray) -> jnp.ndarray:
        img0 = frames[:-1] * 255.0
        img1 = frames[1:] * 255.0
        if (ph, pw) != (H, W):
            img0 = _resize_bilinear(img0, ph, pw)
            img1 = _resize_bilinear(img1, ph, pw)
        flow = model.apply(params, img0, img1)  # (T-1, ph, pw, 2)
        if (ph, pw) != (H, W):
            flow = _resize_bilinear(flow, H, W)
            flow = flow * jnp.asarray([W / pw, H / ph], flow.dtype)
        return flow

    return flow_fn


def make_bidirectional_flow_fn(model: UniMatch, params, image_hw: Tuple[int, int]):
    """(T, H, W, 3) -> (forward_flow (T-1,...), backward_flow (T-1,...))
    (reference inference_flow_warpper_v2, :148-184)."""
    fwd = make_flow_fn(model, params, image_hw)

    def bidir(frames):
        return fwd(frames), fwd(frames[::-1])[::-1]

    return bidir


def flow_normalize(flow: jnp.ndarray) -> jnp.ndarray:
    """Identity in the reference's shipped code (:36-42) — kept for API parity."""
    return flow


def make_stereo_fn(model: UniMatch, params, image_hw: Tuple[int, int]):
    """Returns a jitted fn: (left, right) (B, H, W, 3) in [0,1] -> disparity (B, H, W).
    Mirrors the reference gmstereo evaluation path (unimatch/unimatch.py task='stereo')."""
    H, W = image_hw
    ph = -(-H // PADDING_FACTOR) * PADDING_FACTOR
    pw = -(-W // PADDING_FACTOR) * PADDING_FACTOR

    @jax.jit
    def stereo_fn(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        l, r = left * 255.0, right * 255.0
        if (ph, pw) != (H, W):
            l, r = _resize_bilinear(l, ph, pw), _resize_bilinear(r, ph, pw)
        disp = model.apply(params, l, r, task="stereo")[..., None]
        if (ph, pw) != (H, W):
            disp = _resize_bilinear(disp, H, W) * (W / pw)
        return disp[..., 0]

    return stereo_fn


def make_depth_fn(model: UniMatch, params, image_hw: Tuple[int, int],
                  min_depth: float = 0.5, max_depth: float = 10.0,
                  num_depth_candidates: int = 64):
    """Returns a jitted fn: (img0, img1, intrinsics (B,3,3), pose (B,4,4)) -> depth
    (B, H, W), img* in [0,1]. Plane-sweep matching (unimatch/matching.py:203-236).
    ``min_depth``/``max_depth`` are METRIC depths (converted to the inverse-depth range
    the matcher sweeps). Requires the input resolution to be a multiple of 16 (intrinsics
    must describe the fed image, so no silent resizing here)."""
    H, W = image_hw
    assert H % PADDING_FACTOR == 0 and W % PADDING_FACTOR == 0, \
        "depth task: pass an intrinsics-consistent multiple-of-16 resolution"

    @jax.jit
    def depth_fn(img0, img1, intrinsics, pose):
        return model.apply(params, img0 * 255.0, img1 * 255.0, task="depth",
                           intrinsics=intrinsics, pose=pose,
                           min_depth=1.0 / min_depth, max_depth=1.0 / max_depth,
                           num_depth_candidates=num_depth_candidates)

    return depth_fn
