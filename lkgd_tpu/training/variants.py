"""Training-step builders for the remaining reference trainer families (SURVEY.md §2.5).

  * ControlNet-SDV training (`train_svd_controlnet.py`): the ControlNet branch trains
    against a frozen UNet, EDM loss, optional EMA (reference :928-964, flow control :1311)
  * flow-diffusion training (`train_svd_of.py` / `_fix`): denoise flow-image latents with
    flow-latent normalization; same EDM math, different data
  * reverse-time and consecutive-clip variants (`train_svd_reverse_lora.py`,
    `train_svd_consec_lora.py`): pure data transforms implemented here as batch adapters
  * in-training validation sampling (reference `train_svd_lora.py:1750-1832`): render
    clips with the current params every N steps and write GIFs
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from lkgd_tpu.training import edm
from lkgd_tpu.training.train_state import SVDTrainConfig, TrainState


def make_controlnet_train_step(unet, controlnet, optimizer,
                               config: SVDTrainConfig = SVDTrainConfig()):
    """Train the ControlNet branch against a frozen UNet (reference
    train_svd_controlnet.py:928-931,1311: flow images as control).

    params tree: {"unet": frozen, "controlnet": trained}. batch adds
    ``control`` (B, T, H, W, C_cond) image-space control frames."""

    def loss_fn(cn_params, unet_params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        bsz, num_frames = latents.shape[0], latents.shape[1]
        r_sigma, r_noise = jax.random.split(rng)
        sigmas = edm.rand_cosine_interpolated(r_sigma, (bsz,), config.edm)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        noisy, inp = edm.precondition_inputs(latents, noise, sigmas)
        timesteps = edm.timesteps_from_sigmas(sigmas)

        cond = jnp.repeat(batch["cond_latents"][:, None], num_frames, axis=1)
        model_in = jnp.concatenate([inp.astype(cond.dtype), cond], axis=-1)
        added = jnp.tile(jnp.asarray([[config.fps, config.motion_bucket_id,
                                       config.train_noise_aug]], jnp.float32), (bsz, 1))
        down_res, mid_res = controlnet.apply(
            cn_params, model_in, timesteps, batch["image_embeddings"], added,
            controlnet_cond=batch["control"])
        pred = unet.apply(unet_params, model_in, timesteps, batch["image_embeddings"],
                          added, down_block_additional_residuals=down_res,
                          mid_block_additional_residual=mid_res)
        return edm.edm_loss(pred.astype(jnp.float32), noisy, latents, sigmas)

    def train_step(state: TrainState, batch, rng):
        unet_params = batch["unet_params"]
        loss, grads = jax.value_and_grad(loss_fn)(state.params, unet_params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:  # reference uses EMAModel for the controlnet (:964)
            ema = jax.tree.map(lambda e, p: e * 0.9999 + p * 0.0001, ema, params)
        return TrainState(state.step + 1, params, opt_state, ema), loss

    return train_step


def reverse_time_batch(batch: dict) -> dict:
    """train_svd_reverse_lora.py:1466 — flip the frame axis; conditioning frame becomes
    the (original) last frame, which after the flip is frame 0 again."""
    out = dict(batch)
    out["latents"] = batch["latents"][:, ::-1]
    return out


def consecutive_clip_batches(latents: jnp.ndarray, clip_len: int):
    """train_svd_consec_lora.py: split a long latent clip into two consecutive windows
    (x = first, y = continuation) for joint-stream training. Returns stream-major
    (2B, clip_len, ...) latents."""
    x = latents[:, :clip_len]
    y = latents[:, clip_len:2 * clip_len]
    return jnp.concatenate([x, y], axis=0)


def make_validation_sampler(pipeline, params_base: dict, images, out_dir: str,
                            fps: int = 7, rng: Optional[jax.Array] = None):
    """Returns a Trainer validation_fn that renders clips with the CURRENT trained unet
    params (EMA if present) and writes GIFs (reference in-training validation sampling,
    train_svd_lora.py:1750-1832). ``params_base`` holds the frozen vae/image_encoder."""
    import os

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def validate(state: TrainState, step: int):
        from lkgd_tpu.data.video_io import write_video

        params = dict(params_base)
        params["unet"] = state.ema_params if state.ema_params is not None else state.params
        for i, img in enumerate(images):
            frames = pipeline(params, img, rng=jax.random.fold_in(base_rng, step * 100 + i))
            write_video(os.path.join(out_dir, f"step{step}_sample{i}.gif"),
                        np.asarray(frames[0]), fps=fps)
        return {"num_samples": len(images)}

    return validate
