"""Optical-flow codecs and latent normalization (JAX port of the numeric conventions in
`/root/reference/utils/optical_flow.py:40-107` — flow<->RGB-image encodings, polar
expansion, and the flow-latent mean/std used by the flow-diffusion pipelines)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FLOW_CLIP_MAX = 50.0
FLOW_NORM_CLIP_MAX = float(np.sqrt(2 * FLOW_CLIP_MAX**2))
FLOW_LATENT_MEAN = 0.5020191669464111
FLOW_LATENT_STD = 1.2818458080291748


def flow_latent_normalize(latents: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """(x*scale - mean)/std / scale, fp32 internally (reference :65-73)."""
    dtype = latents.dtype
    x = latents.astype(jnp.float32) * scale
    x = (x - FLOW_LATENT_MEAN) / FLOW_LATENT_STD
    return (x / scale).astype(dtype)


def flow_latent_unnormalize(latents: jnp.ndarray) -> jnp.ndarray:
    return latents * FLOW_LATENT_STD + FLOW_LATENT_MEAN


def flow_to_image_naive(flow: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 2) flow -> (..., H, W, 3) [0,1] image: [0, clip(u), clip(v)]
    (reference :79-92, channels-last here)."""
    clipped = jnp.clip(flow, -FLOW_CLIP_MAX, FLOW_CLIP_MAX) / FLOW_CLIP_MAX
    clipped = (clipped + 1.0) / 2.0
    zeros = jnp.zeros_like(clipped[..., :1])
    return jnp.concatenate([zeros, clipped], axis=-1)


def image_to_flow_naive(flow_image: jnp.ndarray) -> jnp.ndarray:
    """Inverse of flow_to_image_naive (reference :94-107)."""
    return (flow_image[..., 1:] * 2.0 - 1.0) * FLOW_CLIP_MAX


def flow_expand_polar(flow: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 2) -> (..., H, W, 4): append (norm, angle/pi) (reference :46-51)."""
    norm = jnp.linalg.norm(flow, axis=-1, keepdims=True)
    angle = jnp.arctan2(flow[..., 1:2], flow[..., 0:1]) / jnp.pi
    return jnp.concatenate([flow, norm, angle], axis=-1)


def flow_squeeze_polar(flow4: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 4) -> (..., H, W, 2) from the polar channels (reference :53-58)."""
    norm, angle = flow4[..., 2], flow4[..., 3] * jnp.pi
    return jnp.stack([jnp.cos(angle) * norm, jnp.sin(angle) * norm], axis=-1)
