"""SD 2D training steps — the reference's 2D trainer family in one builder
(`train_lora.py`, `train_joint_lora.py`, `train_mask_depth_lora_joint.py`,
`train_multi_cond_lora_joint.py`, ... SURVEY.md §2.5):

  * epsilon-prediction DDPM MSE with optional min-SNR (snr_gamma) weighting
  * joint x/y stream batches with **timestep alignment**: both halves share sampled
    timesteps unless ``no_timestep_align`` (reference train_mask_depth_lora_joint.py:1068)
  * prompt and condition dropout for CFG; gaussian-field mask conditioning hooks
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from lkgd_tpu.schedulers.cogvideox_ddim import CogVideoXDDIMScheduler
from lkgd_tpu.training.train_state import TrainState


@dataclasses.dataclass(frozen=True)
class SD2DTrainConfig:
    snr_gamma: Optional[float] = None  # min-SNR weighting (5.0 in the reference launchers)
    prompt_dropout_prob: float = 0.1
    joint_streams: bool = False  # batch = [x*, y*] halves
    no_timestep_align: bool = False  # "nta" checkpoints: independent t per half
    num_train_timesteps: int = 1000


def make_sd2d_train_step(unet, optimizer, scheduler: Optional[CogVideoXDDIMScheduler] = None,
                         config: SD2DTrainConfig = SD2DTrainConfig()):
    """batch: latents (B, H, W, 4) scaled; prompt_embeds (B, L, D); optional
    extra_channels (B, H, W, C) concatenated to the model input (mask/masked-latents for
    inpaint bases); optional cond_image for the image-space conditioning encoder."""
    from lkgd_tpu.pipelines.sd2d import sd_ddim_config

    sched = scheduler or CogVideoXDDIMScheduler(
        sd_ddim_config(config.num_train_timesteps))
    acp = jnp.asarray(sched.alphas_cumprod, jnp.float32)

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        b = latents.shape[0]
        r_t, r_noise, r_drop = jax.random.split(rng, 3)

        if config.joint_streams and not config.no_timestep_align:
            # x/y halves share timesteps (reference :1068-1072)
            t_half = jax.random.randint(r_t, (b // 2,), 0, config.num_train_timesteps)
            timesteps = jnp.concatenate([t_half, t_half])
        else:
            timesteps = jax.random.randint(r_t, (b,), 0, config.num_train_timesteps)

        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        noisy = sched.add_noise(latents, noise, timesteps)

        ehs = batch["prompt_embeds"]
        if config.prompt_dropout_prob:
            drop = jax.random.uniform(r_drop, (b,)) < config.prompt_dropout_prob
            ehs = jnp.where(drop[:, None, None], jnp.zeros_like(ehs), ehs)

        model_in = noisy
        if batch.get("extra_channels") is not None:
            model_in = jnp.concatenate(
                [model_in, batch["extra_channels"].astype(model_in.dtype)], axis=-1)
        pred = unet.apply(params, model_in, timesteps.astype(jnp.float32), ehs,
                          cond_image=batch.get("cond_image"))

        err = (pred.astype(jnp.float32) - noise) ** 2
        if config.snr_gamma is not None:
            a = acp[timesteps]
            snr = a / jnp.maximum(1.0 - a, 1e-8)
            w = jnp.minimum(snr, config.snr_gamma) / jnp.maximum(snr, 1e-8)
            err = err * w[:, None, None, None]
        return err.mean()

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state, state.ema_params), loss

    return train_step
