"""CogVideoX DDIM scheduler — functional, scan-friendly.

The reference trains/validates CogVideoX with diffusers' CogVideoXDDIMScheduler
(v-prediction, scaled-linear betas with an SNR shift ``acp / (s + (1-s) acp)`` for
s = snr_shift_scale = 3.0, zero-terminal-SNR rescale, trailing spacing); consumed at
`CogVideo-main/finetune/models/cogvideox_i2v/lora_trainer.py:166+` and the I2V pipeline.
Same functional design as schedulers/euler_discrete.py: immutable schedule + pure step.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CogVideoXDDIMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    snr_shift_scale: float = 3.0
    rescale_betas_zero_snr: bool = True
    timestep_spacing: str = "trailing"
    prediction_type: str = "v_prediction"
    set_alpha_to_one: bool = True


class DDIMSchedule(NamedTuple):
    timesteps: jnp.ndarray  # (N,) int32, descending
    alphas_cumprod_t: jnp.ndarray  # (N,) acp at each timestep
    alphas_cumprod_prev: jnp.ndarray  # (N,) acp at the previous (next-step) timestep

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


class CogVideoXDDIMScheduler:
    def __init__(self, config: CogVideoXDDIMConfig = CogVideoXDDIMConfig()):
        self.config = config
        betas = np.linspace(config.beta_start**0.5, config.beta_end**0.5,
                            config.num_train_timesteps, dtype=np.float64) ** 2
        acp = np.cumprod(1.0 - betas)
        # SNR shift (CogVideoX-specific)
        s = config.snr_shift_scale
        acp = acp / (s + (1.0 - s) * acp)
        if config.rescale_betas_zero_snr:
            sqrt_acp = np.sqrt(acp)
            a0, aT = sqrt_acp[0], sqrt_acp[-1]
            sqrt_acp = (sqrt_acp - aT) * (a0 / (a0 - aT))
            acp = sqrt_acp**2
        self.alphas_cumprod = acp  # (T,)
        self.final_alpha_cumprod = 1.0 if config.set_alpha_to_one else float(acp[0])

    def set_timesteps(self, num_inference_steps: int) -> DDIMSchedule:
        cfg = self.config
        if cfg.timestep_spacing == "trailing":
            step_ratio = cfg.num_train_timesteps / num_inference_steps
            ts = (np.arange(cfg.num_train_timesteps, 0, -step_ratio)).round().astype(np.int64) - 1
        elif cfg.timestep_spacing == "linspace":
            ts = np.linspace(0, cfg.num_train_timesteps - 1,
                             num_inference_steps).round()[::-1].astype(np.int64)
        else:  # leading
            step_ratio = cfg.num_train_timesteps // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        prev_ts = ts - cfg.num_train_timesteps // num_inference_steps
        acp_t = self.alphas_cumprod[ts]
        acp_prev = np.where(prev_ts >= 0, self.alphas_cumprod[np.maximum(prev_ts, 0)],
                            self.final_alpha_cumprod)
        return DDIMSchedule(
            timesteps=jnp.asarray(ts, jnp.int32),
            alphas_cumprod_t=jnp.asarray(acp_t, jnp.float32),
            alphas_cumprod_prev=jnp.asarray(acp_prev, jnp.float32),
        )

    def step(self, schedule: DDIMSchedule, model_output: jnp.ndarray, step_index,
             sample: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Deterministic DDIM update (eta=0). Returns (prev_sample, pred_x0)."""
        a_t = schedule.alphas_cumprod_t[step_index]
        a_prev = schedule.alphas_cumprod_prev[step_index]
        x = sample.astype(jnp.float32)
        v = model_output.astype(jnp.float32)
        if self.config.prediction_type == "v_prediction":
            x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1.0 - a_t) * v
            eps = jnp.sqrt(a_t) * v + jnp.sqrt(1.0 - a_t) * x
        elif self.config.prediction_type == "epsilon":
            eps = v
            x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        else:
            raise ValueError(self.config.prediction_type)
        prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return prev.astype(sample.dtype), x0.astype(sample.dtype)

    def add_noise(self, original: jnp.ndarray, noise: jnp.ndarray,
                  timesteps: jnp.ndarray) -> jnp.ndarray:
        acp = jnp.asarray(self.alphas_cumprod, jnp.float32)[timesteps]
        acp = acp.reshape(acp.shape + (1,) * (original.ndim - acp.ndim))
        return jnp.sqrt(acp) * original + jnp.sqrt(1.0 - acp) * noise

    def get_velocity(self, sample: jnp.ndarray, noise: jnp.ndarray,
                     timesteps: jnp.ndarray) -> jnp.ndarray:
        """v-prediction target (training, reference lora_trainer compute_loss)."""
        acp = jnp.asarray(self.alphas_cumprod, jnp.float32)[timesteps]
        acp = acp.reshape(acp.shape + (1,) * (sample.ndim - acp.ndim))
        return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * sample
