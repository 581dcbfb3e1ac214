"""Optical-flow video-diffusion pipelines.

Re-designs the reference flow pipelines:
  * ``flow``      (`pipeline_stable_video_diffusion_flow.py:440-580`): denoise a *flow*
    video — CLIP conditions on the RGB frame, the VAE conditioning channel carries the
    normalized flow-image latents, and outputs are un-normalized before decode.
  * ``flow_fix``  (`pipeline_stable_video_diffusion_flow_fix.py:455-540`): conditions on
    BOTH flow and RGB latents (8 cond channels) through the dual-conv_in UNet variant
    (``SVDUNetConfig.dual_cond_conv_in``).
  * ``joint_vf``  (`pipeline_stable_video_diffusion_joint_vf.py:560-577`): joint
    video+flow denoising as two coupled streams; the flow half is un-normalized and
    returned separately.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline
from lkgd_tpu.utils.flow_codec import flow_latent_normalize, flow_latent_unnormalize


class StableVideoDiffusionFlowPipeline(StableVideoDiffusionPipeline):
    """mode="flow": generate flow video from (image, flow_cond image).
    mode="flow_fix": same but dual conditioning (flow + RGB) for the flow-variant UNet."""

    def __init__(self, *args, mode: str = "flow", **kwargs):
        assert mode in ("flow", "flow_fix")
        super().__init__(*args, **kwargs)
        self.mode = mode

    def _generate_impl(self, params, image: jnp.ndarray, rng: jax.Array,
                       flow_cond: Optional[jnp.ndarray] = None):
        cfg = self.config
        batch_size = image.shape[0]
        rng_aug, rng_aug2, rng_lat = jax.random.split(rng, 3)

        image_embeddings = self._encode_clip(params["image_encoder"], image)
        if cfg.do_classifier_free_guidance:
            image_embeddings = jnp.concatenate(
                [jnp.zeros_like(image_embeddings), image_embeddings], axis=0)

        def vae_cond(x, key):
            x = x * 2.0 - 1.0
            x = x + cfg.noise_aug_strength * jax.random.normal(key, x.shape, jnp.float32)
            lat = self._encode_vae_cond(params["vae"], x)
            if cfg.do_classifier_free_guidance:
                lat = jnp.concatenate([jnp.zeros_like(lat), lat], axis=0)
            return lat

        if flow_cond is None:
            flow_cond = jnp.zeros_like(image)
        if self.mode == "flow":
            # conditioning channel = normalized flow latents (reference flow :453-470)
            cond = vae_cond(flow_cond, rng_aug)
            cond = flow_latent_normalize(cond, scale=self.vae_scaling)
        else:  # flow_fix: [flow latents | rgb latents] (reference flow_fix :455-483)
            flow_lat = vae_cond(flow_cond, rng_aug)
            img_lat = vae_cond(image, rng_aug2)
            cond = jnp.concatenate([flow_lat, img_lat], axis=-1)
        cond = jnp.repeat(cond[:, None], cfg.num_frames, axis=1)

        rows = batch_size * (2 if cfg.do_classifier_free_guidance else 1)
        added_time_ids = self._add_time_ids(rows)

        latents = jax.random.normal(
            rng_lat, (batch_size, cfg.num_frames, self.latent_height, self.latent_width, 4),
            jnp.float32) * self.schedule.init_noise_sigma

        guidance = self._guidance_scale(batch_size)
        schedule, scheduler = self.schedule, self.scheduler

        def step_fn(latents, i):
            model_in = (jnp.concatenate([latents] * 2, axis=0)
                        if cfg.do_classifier_free_guidance else latents)
            model_in = scheduler.scale_model_input(schedule, model_in, i)
            model_in = jnp.concatenate([model_in.astype(self.dtype), cond], axis=-1)
            noise_pred = self.unet.apply(
                params["unet"], model_in, schedule.timesteps[i], image_embeddings,
                added_time_ids).astype(jnp.float32)
            if cfg.do_classifier_free_guidance:
                uncond, c = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance * (c - uncond)
            latents, _ = scheduler.step(schedule, noise_pred, i, latents)
            return latents, ()

        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(schedule.num_steps))
        return latents  # normalized flow latents; __call__ un-normalizes before decode

    def __call__(self, params, image, flow_cond=None, rng: Optional[jax.Array] = None,
                 output_type: str = "np"):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if flow_cond is not None:
            flow_cond = jnp.asarray(flow_cond, jnp.float32)
            if flow_cond.ndim == 3:
                flow_cond = flow_cond[None]
        latents = self._generate(params, image, rng, flow_cond=flow_cond)
        if output_type == "latent":
            return latents
        # un-normalize flow latents before decode (reference flow :565-570)
        out = self._decode(params["vae"], flow_latent_unnormalize(latents))
        return np.asarray(out) if output_type == "np" else out


class StableVideoDiffusionJointVFPipeline(StableVideoDiffusionPipeline):
    """Joint video+flow generation: stream 0 denoises the RGB video, stream 1 the flow
    video (coupled through the UNet's joint attention + stream-masked LoRA routing, which
    the reference wires via x/y lora masks — `pipeline_..._joint_vf.py:560-577`).
    Returns (frames, flows)."""

    def _generate_impl(self, params, image: jnp.ndarray, rng: jax.Array,
                       flow_cond: Optional[jnp.ndarray] = None):
        cfg = self.config
        assert image.shape[0] == 1, "joint_vf generates one video+flow pair"
        rng_aug, rng_aug2, rng_lat = jax.random.split(rng, 3)

        emb = self._encode_clip(params["image_encoder"], image)  # (1, 1, D)
        image_embeddings = jnp.concatenate([emb, emb], axis=0)  # x + y streams
        if cfg.do_classifier_free_guidance:
            image_embeddings = jnp.concatenate(
                [jnp.zeros_like(image_embeddings), image_embeddings], axis=0)

        img_lat = self._encode_vae_cond(
            params["vae"], image * 2.0 - 1.0
            + cfg.noise_aug_strength * jax.random.normal(rng_aug, image.shape, jnp.float32))
        if flow_cond is None:
            flow_lat = flow_latent_normalize(img_lat * 0.0, scale=self.vae_scaling)
        else:
            flow_lat = self._encode_vae_cond(
                params["vae"], flow_cond * 2.0 - 1.0
                + cfg.noise_aug_strength * jax.random.normal(rng_aug2, flow_cond.shape, jnp.float32))
            flow_lat = flow_latent_normalize(flow_lat, scale=self.vae_scaling)
        cond = jnp.concatenate([img_lat, flow_lat], axis=0)  # (2, h, w, 4)
        if cfg.do_classifier_free_guidance:
            cond = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)
        cond = jnp.repeat(cond[:, None], cfg.num_frames, axis=1)

        rows = 2 * (2 if cfg.do_classifier_free_guidance else 1)
        added_time_ids = self._add_time_ids(rows)

        latents = jax.random.normal(
            rng_lat, (2, cfg.num_frames, self.latent_height, self.latent_width, 4),
            jnp.float32) * self.schedule.init_noise_sigma

        guidance = self._guidance_scale(2)
        schedule, scheduler = self.schedule, self.scheduler

        def step_fn(latents, i):
            model_in = (jnp.concatenate([latents] * 2, axis=0)
                        if cfg.do_classifier_free_guidance else latents)
            model_in = scheduler.scale_model_input(schedule, model_in, i)
            model_in = jnp.concatenate([model_in.astype(self.dtype), cond], axis=-1)
            noise_pred = self.unet.apply(
                params["unet"], model_in, schedule.timesteps[i], image_embeddings,
                added_time_ids).astype(jnp.float32)
            if cfg.do_classifier_free_guidance:
                uncond, c = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance * (c - uncond)
            latents, _ = scheduler.step(schedule, noise_pred, i, latents)
            return latents, ()

        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(schedule.num_steps))
        return latents

    def __call__(self, params, image, flow_cond=None, rng: Optional[jax.Array] = None,
                 output_type: str = "np"):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if flow_cond is not None:
            flow_cond = jnp.asarray(flow_cond, jnp.float32)
            if flow_cond.ndim == 3:
                flow_cond = flow_cond[None]
        latents = self._generate(params, image, rng, flow_cond=flow_cond)
        if output_type == "latent":
            return latents
        # two same-shape decodes -> one compiled decode program reused for both streams
        frames = self._decode(params["vae"], latents[:1])
        flows = self._decode(params["vae"], flow_latent_unnormalize(latents[1:]))
        out = (frames, flows)
        if output_type == "np":
            return jax.tree.map(np.asarray, out)
        return out
