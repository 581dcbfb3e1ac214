"""Antialiased bicubic resize as two precomputed matmuls.

The reference CLIP-conditioning path resizes frames to 224x224 with a gaussian blur
followed by bicubic interpolation with align_corners=True
(`/root/reference/pipeline/pipeline_stable_video_diffusion_trans.py:661-765`). Both stages
are fixed linear operators for a given (in, out) size, so on TPU we precompute the composed
(out, in) matrix per axis on the host and apply ``out = M_h @ img @ M_w^T`` — exact,
cache-friendly, and a pure MXU workload instead of gather-heavy interpolation.

Matches torch semantics: gaussian sigma = max((in/out - 1)/2, 0.001), kernel size
max(4*sigma, 3) rounded odd, reflect padding; bicubic a = -0.75, align_corners=True.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - ksize // 2
    if ksize % 2 == 0:
        x = x + 0.5
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def _reflect_index(idx: np.ndarray, n: int) -> np.ndarray:
    """torch F.pad mode='reflect' indexing (no edge repeat)."""
    idx = np.abs(idx)
    idx = np.where(idx >= n, 2 * (n - 1) - idx, idx)
    return np.clip(idx, 0, n - 1)


def _blur_matrix(n: int, sigma: float, ksize: int) -> np.ndarray:
    kernel = _gaussian_kernel(ksize, sigma)
    m = np.zeros((n, n), dtype=np.float64)
    half = ksize // 2
    for j, w in enumerate(kernel):
        src = _reflect_index(np.arange(n) + (j - half), n)
        m[np.arange(n), src] += w
    return m


def _cubic_weights(t: np.ndarray, a: float = -0.75):
    """torch bicubic convolution weights for the 4 taps around fractional position t."""

    def c1(x):  # |x| <= 1
        return ((a + 2) * x - (a + 3)) * x * x + 1

    def c2(x):  # 1 < |x| < 2
        return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a

    return np.stack([c2(t + 1.0), c1(t), c1(1.0 - t), c2(2.0 - t)], axis=-1)


def _bicubic_matrix(out_n: int, in_n: int) -> np.ndarray:
    """align_corners=True bicubic interpolation matrix (out_n, in_n)."""
    if out_n == 1 or in_n == 1:
        x = np.zeros(out_n)
    else:
        x = np.arange(out_n, dtype=np.float64) * (in_n - 1) / (out_n - 1)
    x0 = np.floor(x).astype(np.int64)
    t = x - x0
    w = _cubic_weights(t)  # (out_n, 4)
    m = np.zeros((out_n, in_n), dtype=np.float64)
    for k in range(4):
        src = np.clip(x0 + k - 1, 0, in_n - 1)
        m[np.arange(out_n), src] += w[:, k]
    return m


@functools.lru_cache(maxsize=64)
def _bicubic_matrix_half_pixel(out_n: int, in_n: int) -> np.ndarray:
    """align_corners=False (half-pixel) bicubic matrix (out_n, in_n) — torch
    ``F.interpolate(mode="bicubic", align_corners=False)`` / HF Dinov2
    ``interpolate_pos_encoding`` semantics, a = -0.75, no antialias."""
    x = (np.arange(out_n, dtype=np.float64) + 0.5) * in_n / out_n - 0.5
    x0 = np.floor(x).astype(np.int64)
    t = x - x0
    w = _cubic_weights(t)  # (out_n, 4)
    m = np.zeros((out_n, in_n), dtype=np.float64)
    for k in range(4):
        src = np.clip(x0 + k - 1, 0, in_n - 1)
        m[np.arange(out_n), src] += w[:, k]
    return m.astype(np.float32)


def bicubic_resize(images: jnp.ndarray, size) -> jnp.ndarray:
    """(..., H, W, C) -> (..., size[0], size[1], C): torch-parity bicubic
    (a=-0.75, half-pixel/align_corners=False, NO antialias) as two matmuls.
    jax.image.resize("cubic") uses the Keys a=-0.5 kernel and so does NOT match
    torch oracles; this does (tests/test_resize.py)."""
    out_h, out_w = size
    in_h, in_w = images.shape[-3], images.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return images
    m_h = jnp.asarray(_bicubic_matrix_half_pixel(out_h, in_h))
    m_w = jnp.asarray(_bicubic_matrix_half_pixel(out_w, in_w))
    x = images.astype(jnp.float32)
    x = jnp.einsum("oh,...hwc->...owc", m_h, x)
    x = jnp.einsum("ow,...hwc->...hoc", m_w, x)
    return x.astype(images.dtype)


@functools.lru_cache(maxsize=32)
def _resize_matrices(in_h: int, in_w: int, out_h: int, out_w: int):
    factors = (in_h / out_h, in_w / out_w)
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = [int(max(2.0 * 2 * s, 3)) for s in sigmas]
    ks = [k + 1 if k % 2 == 0 else k for k in ks]
    m_h = _bicubic_matrix(out_h, in_h) @ _blur_matrix(in_h, sigmas[0], ks[0])
    m_w = _bicubic_matrix(out_w, in_w) @ _blur_matrix(in_w, sigmas[1], ks[1])
    return m_h.astype(np.float32), m_w.astype(np.float32)


def resize_with_antialiasing(images: jnp.ndarray, size) -> jnp.ndarray:
    """(..., H, W, C) -> (..., size[0], size[1], C), fp32 internally."""
    out_h, out_w = size
    in_h, in_w = images.shape[-3], images.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return images
    m_h, m_w = _resize_matrices(in_h, in_w, out_h, out_w)
    x = images.astype(jnp.float32)
    x = jnp.einsum("oh,...hwc->...owc", jnp.asarray(m_h), x)
    x = jnp.einsum("ow,...hwc->...hoc", jnp.asarray(m_w), x)
    return x.astype(images.dtype)
