"""EDM training-time noise math (Karras et al. 2022 preconditioning).

Mirrors the reference training scripts' sigma sampling and loss scalings
(`/root/reference/train_models/train_svd_lora.py:269-316,1653-1672`), re-expressed as pure
JAX functions of an explicit PRNG key.

Reference constants for the LKGD fine-tune (train_svd_lora.py:310-316):
``sigma in [0.002, 700], image_d=64, noise_d_low=32, noise_d_high=64, sigma_data=0.5``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EDMConfig:
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    sigma_data: float = 0.5
    image_d: int = 64
    noise_d_low: int = 32
    noise_d_high: int = 64


def stratified_uniform(key: jax.Array, shape: Tuple[int, ...], group: int = 0, groups: int = 1,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Stratified U[0,1) samples (reference :268-277; k-diffusion)."""
    if groups <= 0:
        raise ValueError(f"groups must be positive, got {groups}")
    if group < 0 or group >= groups:
        raise ValueError(f"group must be in [0, {groups})")
    n = shape[-1] * groups
    offsets = jnp.arange(group, n, groups, dtype=dtype)
    u = jax.random.uniform(key, shape, dtype=dtype)
    return (offsets + u) / n


def rand_cosine_interpolated(key: jax.Array, shape: Tuple[int, ...], config: EDMConfig = EDMConfig(),
                             dtype=jnp.float32) -> jnp.ndarray:
    """Sample sigmas from the interpolated cosine logSNR schedule (reference :281-307;
    'simple diffusion', Hoogeboom et al.)."""

    def logsnr_schedule_cosine(t, logsnr_min, logsnr_max):
        t_min = math.atan(math.exp(-0.5 * logsnr_max))
        t_max = math.atan(math.exp(-0.5 * logsnr_min))
        return -2.0 * jnp.log(jnp.tan(t_min + t * (t_max - t_min)))

    def shifted(t, image_d, noise_d, logsnr_min, logsnr_max):
        shift = 2.0 * math.log(noise_d / image_d)
        return logsnr_schedule_cosine(t, logsnr_min - shift, logsnr_max - shift) + shift

    logsnr_min = -2.0 * math.log(config.sigma_min / config.sigma_data)
    logsnr_max = -2.0 * math.log(config.sigma_max / config.sigma_data)
    u = stratified_uniform(key, shape, dtype=dtype)
    logsnr_low = shifted(u, config.image_d, config.noise_d_low, logsnr_min, logsnr_max)
    logsnr_high = shifted(u, config.image_d, config.noise_d_high, logsnr_min, logsnr_max)
    logsnr = logsnr_low + u * (logsnr_high - logsnr_low)
    return jnp.exp(-logsnr / 2.0) * config.sigma_data


def timesteps_from_sigmas(sigmas: jnp.ndarray) -> jnp.ndarray:
    """Continuous v-prediction timesteps: 0.25 * log(sigma) (reference :1526-1527)."""
    return 0.25 * jnp.log(sigmas)


def precondition_inputs(latents: jnp.ndarray, noise: jnp.ndarray, sigmas: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (noisy_latents, model_input) with sigma broadcast over trailing dims.

    noisy = x + sigma*eps; model input = noisy / sqrt(sigma^2+1) (reference :1525-1530).
    """
    s = sigmas.reshape(sigmas.shape + (1,) * (latents.ndim - sigmas.ndim))
    noisy = latents + noise * s
    return noisy, noisy / jnp.sqrt(s**2 + 1.0)


def denoise_and_weigh(model_pred: jnp.ndarray, noisy_latents: jnp.ndarray, sigmas: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EDM v-prediction scalings: returns (denoised_latents, per-sample weighting).

    c_out = -sigma/sqrt(sigma^2+1), c_skip = 1/(sigma^2+1), w = (1+sigma^2)/sigma^2
    (reference :1653-1657).
    """
    s = sigmas.reshape(sigmas.shape + (1,) * (model_pred.ndim - sigmas.ndim))
    c_out = -s / jnp.sqrt(s**2 + 1.0)
    c_skip = 1.0 / (s**2 + 1.0)
    denoised = model_pred * c_out + c_skip * noisy_latents
    weighing = (1.0 + s**2) / (s**2)
    return denoised, weighing


def edm_loss(model_pred: jnp.ndarray, noisy_latents: jnp.ndarray, target: jnp.ndarray,
             sigmas: jnp.ndarray) -> jnp.ndarray:
    """Weighted MSE on denoised latents, mean over per-sample means (reference :1660-1672)."""
    denoised, weighing = denoise_and_weigh(model_pred, noisy_latents, sigmas)
    per_elem = weighing.astype(jnp.float32) * (denoised.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_sample = per_elem.reshape(target.shape[0], -1).mean(axis=1)
    return per_sample.mean()
