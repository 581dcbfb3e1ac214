"""DDIM inversion + conditioning utilities (reference `utils/util.py:93-310`)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from lkgd_tpu.schedulers.cogvideox_ddim import CogVideoXDDIMScheduler, DDIMSchedule


def ddim_inversion(model_eps: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                   scheduler: CogVideoXDDIMScheduler, schedule: DDIMSchedule,
                   latents: jnp.ndarray) -> jnp.ndarray:
    """Invert clean latents to noise by running DDIM forward (reference
    ``ddim_inversion`` util.py:93): x_{t+1} = sqrt(a_{t+1}) x0_pred + sqrt(1-a_{t+1}) eps.

    ``model_eps(latents, t)`` returns the epsilon prediction. Timesteps ascend (the
    reversed inference schedule).
    """
    acp_t = schedule.alphas_cumprod_t[::-1]
    acp_prev = jnp.concatenate([jnp.ones((1,)), acp_t[:-1]])
    ts = schedule.timesteps[::-1]

    def step(lat, i):
        t = ts[i]
        eps = model_eps(lat, t).astype(jnp.float32)
        a_prev, a_t = acp_prev[i], acp_t[i]
        x0 = (lat - jnp.sqrt(1.0 - a_prev) * eps) / jnp.sqrt(a_prev)
        lat = jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * eps
        return lat, ()

    latents, _ = jax.lax.scan(step, latents.astype(jnp.float32),
                              jnp.arange(schedule.num_steps))
    return latents


def tensor_to_vae_latent(vae_apply: Callable, frames: jnp.ndarray,
                         scaling_factor: float = 0.18215) -> jnp.ndarray:
    """(B, T, H, W, 3) [-1,1] -> scaled latents (reference util.py:234)."""
    b, t = frames.shape[:2]
    flat = frames.reshape((b * t,) + frames.shape[2:])
    lat = vae_apply(flat)
    return lat.reshape((b, t) + lat.shape[1:]) * scaling_factor


def get_add_time_ids(fps: float, motion_bucket_id: float, noise_aug_strength: float,
                     batch_size: int) -> jnp.ndarray:
    """(B, 3) added-time-id rows (reference util.py:250)."""
    return jnp.tile(jnp.asarray([[fps, motion_bucket_id, noise_aug_strength]], jnp.float32),
                    (batch_size, 1))


def parse_checkpoint_behavior_flags(path: str) -> dict:
    """The reference encodes joint-attention behavior in checkpoint DIRECTORY NAMES
    ('flip'/'notemporal'/'nospatial', parsed at utils/util.py:542-560). This helper reads
    them for reference-checkpoint compatibility; new checkpoints should use explicit
    config instead (SURVEY.md §5 flags the dir-name scheme as a footgun)."""
    flip = "noflip" not in path and "flip" in path
    temporal = "notemporal" not in path and "temporal" in path
    spatial = "nospatial" not in path
    return {"flip": flip, "temporal": temporal, "spatial": spatial}
