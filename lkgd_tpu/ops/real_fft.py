"""Real-arithmetic rFFT / irFFT as DFT-basis matmuls.

The TPU backend here does not implement complex dtypes (``jnp.fft.rfft`` and complex
multiplies raise UNIMPLEMENTED), and the LKGD fusion block only ever transforms length-256
vectors (reference `/root/reference/models/unet_spatio_temporal_condition.py:555-592`).
At that size an explicit (N, N/2+1) cos/sin matmul is both exact and *faster* than an FFT on
the MXU, and it keeps the whole fusion block in real bf16/fp32 math.

``rfft_real(x)`` returns (re, im) with the same convention as ``numpy.fft.rfft``:
    re_k = sum_n x_n cos(2*pi*k*n/N),   im_k = -sum_n x_n sin(2*pi*k*n/N)
``irfft_real(re, im)`` inverts to length N = 2*(K-1) like ``numpy.fft.irfft``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _rfft_bases(n: int):
    k = np.arange(n // 2 + 1)[:, None]  # (K, 1)
    t = np.arange(n)[None, :]  # (1, N)
    ang = 2.0 * np.pi * k * t / n
    cos = np.cos(ang).T.astype(np.float32)  # (N, K)
    sin = np.sin(ang).T.astype(np.float32)  # (N, K)
    # DC and (even-N) Nyquist bins are exactly real: zero their sin columns so the
    # imaginary part is an exact +0.0, not rounding noise — downstream arctan2 phase
    # extraction sits on the ±pi branch cut there, and a noise-signed imag flips the
    # phase by 2*pi vs torch.angle (whose rfft imag is exactly zero).
    sin[:, 0] = 0.0
    if n % 2 == 0:
        sin[:, -1] = 0.0
    return cos, sin


@functools.lru_cache(maxsize=16)
def _irfft_bases(n_bins: int):
    n = 2 * (n_bins - 1)
    k = np.arange(n_bins)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    w = np.full((n_bins, 1), 2.0)
    w[0] = 1.0
    w[-1] = 1.0
    cos = (w * np.cos(ang) / n).astype(np.float32)  # (K, N)
    sin = (-w * np.sin(ang) / n).astype(np.float32)  # (K, N)
    return cos, sin


def rfft_real(x: jnp.ndarray):
    """Real FFT over the last axis. Returns (re, im), each (..., N//2+1), fp32."""
    n = x.shape[-1]
    cos, sin = _rfft_bases(n)
    xf = x.astype(jnp.float32)
    re = jnp.dot(xf, jnp.asarray(cos), preferred_element_type=jnp.float32)
    im = -jnp.dot(xf, jnp.asarray(sin), preferred_element_type=jnp.float32)
    # pin the exactly-real bins to +0.0 (a negated zero dot yields -0.0, which sits on
    # the wrong side of the arctan2 +/-pi branch cut vs torch.angle)
    im = im.at[..., 0].set(0.0)
    if n % 2 == 0:
        im = im.at[..., -1].set(0.0)
    return re, im


def irfft_real(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """Inverse real FFT over the last axis: (..., K) -> (..., 2*(K-1)), fp32."""
    n_bins = re.shape[-1]
    cos, sin = _irfft_bases(n_bins)
    out = jnp.dot(re.astype(jnp.float32), jnp.asarray(cos), preferred_element_type=jnp.float32)
    out = out + jnp.dot(im.astype(jnp.float32), jnp.asarray(sin), preferred_element_type=jnp.float32)
    return out
