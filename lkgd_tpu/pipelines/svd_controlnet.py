"""ControlNet-conditioned SVD pipelines.

Covers the reference's ControlNet video pipelines
(`pipeline_stable_video_diffusion_controlnet.py:585-600`, the trans+ControlNet variant
`pipeline_stable_video_diffusion_trans_controlnet.py:584-598`, and the time-reversal
variant `pipeline_stable_video_diffusion_controlnet_time_reversal.py:534-535` — last-frame
conditioning via a time-flip of latents and control sequence) as one class with static
options. Control images (depth / flow / edges, per frame) feed the ControlNet-SDV branch;
its zero-init residuals are added to the UNet skip connections each step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.models.controlnet_svd import ControlNetSDV, ControlNetSDVConfig
from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline


class StableVideoDiffusionControlNetPipeline(StableVideoDiffusionPipeline):
    """img2vid with per-frame control images.

    extra params tree key: ``controlnet``. Call with ``control`` (T, H, W, C_cond).
    ``reverse_time=True`` reproduces the time-reversal pipeline: generation is conditioned
    on the *last* frame by flipping initial latents and the control sequence.
    """

    def __init__(self, *args, controlnet_config: Optional[ControlNetSDVConfig] = None,
                 controlnet_cond_scale: float = 1.0, controlnet_scale: float = 1.0,
                 reverse_time: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.controlnet = ControlNetSDV(
            controlnet_config or ControlNetSDVConfig(unet=self.unet.config), dtype=self.dtype)
        self.controlnet_cond_scale = controlnet_cond_scale
        self.controlnet_scale = controlnet_scale
        self.reverse_time = reverse_time

    def init_params(self, rng: jax.Array, batch_size: int = 1) -> dict:
        params = super().init_params(rng, batch_size)
        cfg = self.config
        rows = 2 * batch_size
        sample = jnp.zeros((rows, cfg.num_frames, self.latent_height, self.latent_width,
                            self.unet.config.in_channels), self.dtype)
        ehs = jnp.zeros((rows, 1, self.unet.config.cross_attention_dim), self.dtype)
        control = jnp.zeros((rows, cfg.num_frames, cfg.height, cfg.width,
                             self.controlnet.config.conditioning_channels), self.dtype)
        params["controlnet"] = self.controlnet.init(
            jax.random.fold_in(rng, 7), sample, jnp.zeros((rows,)), ehs,
            jnp.zeros((rows, 3)), controlnet_cond=control)
        return params

    def _generate_impl(self, params, image: jnp.ndarray, rng: jax.Array,
                       control: Optional[jnp.ndarray] = None,
                       noise_aug: Optional[jnp.ndarray] = None,
                       initial_noise: Optional[jnp.ndarray] = None):
        cfg = self.config
        batch_size = image.shape[0]
        rng_aug, rng_lat = jax.random.split(rng)

        image_embeddings = self._encode_clip(params["image_encoder"], image)
        if cfg.do_classifier_free_guidance:
            image_embeddings = jnp.concatenate(
                [jnp.zeros_like(image_embeddings), image_embeddings], axis=0)
        image_m11 = image * 2.0 - 1.0
        noise = (jax.random.normal(rng_aug, image_m11.shape, jnp.float32)
                 if noise_aug is None else noise_aug.astype(jnp.float32))
        image_latents = self._encode_vae_cond(params["vae"],
                                              image_m11 + cfg.noise_aug_strength * noise)
        if cfg.do_classifier_free_guidance:
            image_latents = jnp.concatenate([jnp.zeros_like(image_latents), image_latents], axis=0)
        image_latents = jnp.repeat(image_latents[:, None], cfg.num_frames, axis=1)

        rows = batch_size * (2 if cfg.do_classifier_free_guidance else 1)
        added_time_ids = self._add_time_ids(rows)

        latents = (jax.random.normal(
            rng_lat, (batch_size, cfg.num_frames, self.latent_height, self.latent_width, 4),
            jnp.float32) if initial_noise is None
            else initial_noise.astype(jnp.float32)) * self.schedule.init_noise_sigma

        if control is None:
            control = jnp.zeros((batch_size, cfg.num_frames, cfg.height, cfg.width,
                                 self.controlnet.config.conditioning_channels), jnp.float32)
        elif control.ndim == 4:
            control = jnp.broadcast_to(control[None], (batch_size,) + control.shape)
        if self.reverse_time:
            # last-frame conditioning (reference time_reversal :534-535)
            latents = latents[:, ::-1]
            control = control[:, ::-1]
        control_rows = (jnp.concatenate([control] * 2, axis=0)
                        if cfg.do_classifier_free_guidance else control).astype(self.dtype)

        guidance = self._guidance_scale(batch_size)
        schedule, scheduler = self.schedule, self.scheduler

        sequential = cfg.sequential_cfg and cfg.do_classifier_free_guidance
        if sequential:
            # (2B, ...) stream-major [uncond; cond] -> (2, B, ...) halves for lax.map
            # (same deployment switch as the base pipeline: one compiled
            # controlnet+unet body executed twice, peak live activations halved)
            emb_pair = image_embeddings.reshape(2, batch_size, *image_embeddings.shape[1:])
            ilat_pair = image_latents.reshape(2, batch_size, *image_latents.shape[1:])
            control_pair = control_rows.reshape(2, batch_size, *control_rows.shape[1:])
            ati_pair = added_time_ids.reshape(2, batch_size, *added_time_ids.shape[1:])

        def step_fn(latents, i):
            if sequential:
                t = schedule.timesteps[i]
                scaled = scheduler.scale_model_input(schedule, latents, i).astype(self.dtype)

                def half(args):
                    emb, ilat, ctl, ati = args
                    m = jnp.concatenate([scaled, ilat], axis=-1)
                    down_res, mid_res = self.controlnet.apply(
                        params["controlnet"], m, t, emb, ati, controlnet_cond=ctl,
                        conditioning_scale=self.controlnet_cond_scale)
                    down_res = tuple(r * self.controlnet_scale for r in down_res)
                    mid_res = mid_res * self.controlnet_scale
                    return self.unet_seq.apply(
                        params["unet"], m, t, emb, ati,
                        down_block_additional_residuals=down_res,
                        mid_block_additional_residual=mid_res)

                eps = jax.lax.map(half, (emb_pair, ilat_pair, control_pair, ati_pair))
                eps = eps.astype(jnp.float32)
                noise_pred = eps[0] + guidance * (eps[1] - eps[0])
                latents, _ = scheduler.step(schedule, noise_pred, i, latents)
                return latents, ()
            model_in = (jnp.concatenate([latents] * 2, axis=0)
                        if cfg.do_classifier_free_guidance else latents)
            model_in = scheduler.scale_model_input(schedule, model_in, i)
            model_in = jnp.concatenate([model_in.astype(self.dtype), image_latents], axis=-1)
            t = schedule.timesteps[i]
            down_res, mid_res = self.controlnet.apply(
                params["controlnet"], model_in, t, image_embeddings, added_time_ids,
                controlnet_cond=control_rows, conditioning_scale=self.controlnet_cond_scale)
            down_res = tuple(r * self.controlnet_scale for r in down_res)
            mid_res = mid_res * self.controlnet_scale
            noise_pred = self.unet.apply(
                params["unet"], model_in, t, image_embeddings, added_time_ids,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res).astype(jnp.float32)
            if cfg.do_classifier_free_guidance:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance * (cond - uncond)
            latents, _ = scheduler.step(schedule, noise_pred, i, latents)
            return latents, ()

        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(schedule.num_steps))
        if self.reverse_time:
            latents = latents[:, ::-1]
        return latents

    def __call__(self, params, image, control=None, rng: Optional[jax.Array] = None,
                 output_type: str = "np", noise_aug: Optional[jnp.ndarray] = None,
                 initial_noise: Optional[jnp.ndarray] = None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        control = None if control is None else jnp.asarray(control, jnp.float32)
        latents = self._generate(params, image, rng, control=control,
                                 noise_aug=noise_aug, initial_noise=initial_noise)
        if output_type == "latent":
            return latents
        out = self._decode(params["vae"], latents)
        return np.asarray(out) if output_type == "np" else out
