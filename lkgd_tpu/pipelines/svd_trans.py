"""Frame-transition pipeline — the LKGD flagship inference path.

Re-designs `/root/reference/pipeline/pipeline_stable_video_diffusion_trans.py:352-656` +
`run_models/run_inference_trans_svd.py`: generation is conditioned on BOTH a start and an
end frame as two coupled streams (x = start-conditioned, y = end-conditioned) whose
self-attention layers cross-talk through the UNet's joint-attention branch. The reference
wires this at runtime with `patch.apply_patch` + masks `[0,1,0,1]`
(`utils/util.py:601-606`); here the joint topology is the UNet config and the pipeline just
orders the batch stream-major: ``[x_uncond, y_uncond, x_cond, y_cond]``.

Deployment note (measured r3): the joint config at the full 14f x 576x1024 exceeds one
16 GB v5e chip even with ``sequential_cfg`` — run full-size joint inference over a mesh
(``mesh=`` on the pipeline; dp/cp sharding is dryrun-certified) or at the reference's
own trans resolution 576x320 (20.84 s/clip measured single-chip).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline


class StableVideoDiffusionTransPipeline(StableVideoDiffusionPipeline):
    """images: (2, H, W, 3) = [start_frame, end_frame]. Returns (2, T, H, W, 3): stream 0
    is the start->end transition; stream 1 its end-conditioned twin."""

    def _generate_impl(self, params, image: jnp.ndarray, rng: jax.Array,
                       noise_aug: Optional[jnp.ndarray] = None,
                       initial_noise: Optional[jnp.ndarray] = None):
        cfg = self.config
        assert image.shape[0] % 2 == 0, "trans pipeline expects [start, end] image pairs"
        rng_aug, rng_lat = jax.random.split(rng)

        # per-stream CLIP + VAE conditioning (each stream sees its own frame)
        image_embeddings = self._encode_clip(params["image_encoder"], image)  # (2B, 1, D)
        image_m11 = image * 2.0 - 1.0
        noise = (jax.random.normal(rng_aug, image_m11.shape, jnp.float32)
                 if noise_aug is None else noise_aug.astype(jnp.float32))
        image_latents = self._encode_vae_cond(params["vae"],
                                              image_m11 + cfg.noise_aug_strength * noise)
        if cfg.do_classifier_free_guidance:
            image_embeddings = jnp.concatenate(
                [jnp.zeros_like(image_embeddings), image_embeddings], axis=0)
            image_latents = jnp.concatenate([jnp.zeros_like(image_latents), image_latents], axis=0)
        image_latents = jnp.repeat(image_latents[:, None], cfg.num_frames, axis=1)

        n_streams = image.shape[0]
        rows = n_streams * (2 if cfg.do_classifier_free_guidance else 1)
        added_time_ids = self._add_time_ids(rows)

        latents = (jax.random.normal(
            rng_lat,
            (n_streams, cfg.num_frames, self.latent_height, self.latent_width, 4),
            jnp.float32) if initial_noise is None
            else initial_noise.astype(jnp.float32)) * self.schedule.init_noise_sigma

        guidance = self._guidance_scale(n_streams)
        schedule, scheduler = self.schedule, self.scheduler

        sequential = cfg.sequential_cfg and cfg.do_classifier_free_guidance
        if sequential:
            # stream-major CFG halves: [x_u, y_u | x_c, y_c] -> (2, n_streams, ...)
            emb_pair = image_embeddings.reshape(2, n_streams, *image_embeddings.shape[1:])
            ilat_pair = image_latents.reshape(2, n_streams, *image_latents.shape[1:])
            ati_pair = added_time_ids.reshape(2, n_streams, *added_time_ids.shape[1:])

        def step_fn(latents, i):
            t = schedule.timesteps[i]
            if sequential:
                scaled = scheduler.scale_model_input(schedule, latents, i).astype(self.dtype)

                def half(args):
                    emb, ilat, ati = args
                    m = jnp.concatenate([scaled, ilat], axis=-1)
                    return self.unet_seq.apply(params["unet"], m, t, emb, ati)

                eps = jax.lax.map(half, (emb_pair, ilat_pair, ati_pair)).astype(jnp.float32)
                noise_pred = eps[0] + guidance * (eps[1] - eps[0])
                latents, _ = scheduler.step(schedule, noise_pred, i, latents)
                return latents, ()
            model_in = (jnp.concatenate([latents] * 2, axis=0)
                        if cfg.do_classifier_free_guidance else latents)
            model_in = scheduler.scale_model_input(schedule, model_in, i)
            model_in = jnp.concatenate([model_in.astype(self.dtype), image_latents], axis=-1)
            noise_pred = self.unet.apply(
                params["unet"], model_in, t, image_embeddings,
                added_time_ids).astype(jnp.float32)
            if cfg.do_classifier_free_guidance:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance * (cond - uncond)
            latents, _ = scheduler.step(schedule, noise_pred, i, latents)
            return latents, ()

        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(schedule.num_steps))
        return latents

    def __call__(self, params, start_image, end_image=None, rng: Optional[jax.Array] = None,
                 output_type: str = "np", noise_aug: Optional[jnp.ndarray] = None,
                 initial_noise: Optional[jnp.ndarray] = None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if end_image is None:
            image = jnp.asarray(start_image, jnp.float32)  # already stacked (2, H, W, 3)
        else:
            image = jnp.stack([jnp.asarray(start_image, jnp.float32),
                               jnp.asarray(end_image, jnp.float32)])
        if output_type == "latent":
            return self._generate(params, image, rng, noise_aug, initial_noise)
        out = self.generate(params, image, rng, noise_aug, initial_noise)
        return np.asarray(out) if output_type == "np" else out
