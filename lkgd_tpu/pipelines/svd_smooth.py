"""Long-video smoothing pipeline — SDEdit refinement with randomized chunk boundaries.

Re-designs `/root/reference/pipeline/pipeline_stable_video_diffusion_smooth.py:320-656` +
`run_models/run_inference_svd_smooth.py`: an existing long video is noised to
``timesteps[start_step]`` and re-denoised; at every step the full sequence is re-chunked at
a *random offset* into <= num_frames windows, each window denoised as a joint
[forward, time-flipped] stream pair conditioned on its own first/last frames, and the
per-chunk noise predictions are stitched back before a global Euler step — the repo's
long-sequence scaling mechanism (SURVEY.md §5 "long-context").

TPU re-design of the dynamic chunking: instead of Python-varying chunk lists (a recompile
per step), the sequence is placed into a fixed ``n_chunks * chunk`` buffer at a traced
front offset via a clamped gather — out-of-range positions replicate the clip's edge
frames (approximating the reference's shorter boundary chunks; see the in-loop comment
for why zero fill is numerically hostile). All chunks run in ONE batched UNet call
(rows stream-major: [fwd*, bwd*, fwd_c*, bwd_c*] -> joint mask (0,1,0,1)); the padded
positions' noise predictions are sliced off before the global Euler step. One compile.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline


class StableVideoDiffusionSmoothPipeline(StableVideoDiffusionPipeline):
    """video: (T_total, H, W, 3) in [0,1]. config.num_frames is the chunk window."""

    def __init__(self, *args, start_step: int = 10, total_frames: int = 50, **kwargs):
        super().__init__(*args, **kwargs)
        self.start_step = start_step
        self.total_frames = total_frames
        chunk = self.config.num_frames
        self.n_chunks = int(np.ceil((total_frames + chunk - 1) / chunk))

    def _generate_impl(self, params, video: jnp.ndarray, rng: jax.Array,
                       noise_aug=None, initial_noise=None):
        """``noise_aug`` / ``initial_noise``: optional pre-drawn standard normals
        (video shape / (1, T, h, w, 4)) replacing the internal PRNG draws — the
        deterministic-noise hooks the base ``generate`` threads through
        (cli/verify_parity record/check; the r4 hook addition broke smooth's
        3-arg signature, caught by the r5 bench refresh)."""
        cfg = self.config
        K = cfg.num_frames
        T = self.total_frames
        NC = self.n_chunks
        padded = NC * K
        rng_aug, rng_noise, rng_offsets = jax.random.split(rng, 3)

        # conditioning for EVERY frame (any frame can become a chunk boundary)
        image_embeddings = self._encode_clip(params["image_encoder"], video)  # (T, 1, D)
        video_m11 = video * 2.0 - 1.0
        noise = (jax.random.normal(rng_aug, video_m11.shape, jnp.float32)
                 if noise_aug is None else noise_aug.astype(jnp.float32))
        cond_latents = self._encode_vae_cond(params["vae"],
                                             video_m11 + cfg.noise_aug_strength * noise)  # (T,h,w,4)
        zero_emb = jnp.zeros_like(image_embeddings[:1])
        zero_lat = jnp.zeros_like(cond_latents[:1])

        # original latents, noised to sigma[start_step] (SDEdit; reference :516-518)
        orig_latents = self._encode_vae_cond(params["vae"], video_m11).astype(jnp.float32)
        orig_latents = orig_latents * self.vae_scaling
        sdedit_noise = (jax.random.normal(rng_noise, (1, T) + orig_latents.shape[1:],
                                          jnp.float32)
                        if initial_noise is None else initial_noise.astype(jnp.float32))
        latents = self.scheduler.add_noise(
            self.schedule, orig_latents[None], sdedit_noise,
            jnp.asarray([self.start_step]))[0]  # (T, h, w, 4)

        added_time_ids = self._add_time_ids(4 * NC)
        schedule, scheduler = self.schedule, self.scheduler
        sequential = cfg.sequential_cfg  # smooth always runs CFG (per-frame guidance)
        if sequential:
            ati_half = self._add_time_ids(2 * NC)
        n_steps = schedule.num_steps - self.start_step
        # one random front offset per step (reference get_chunks rand_first, :526-533)
        offsets = jax.random.randint(rng_offsets, (n_steps,), 0, K)  # front pad in [0, K-1]

        frame_pos = jnp.arange(padded)

        def step_fn(latents, carry_in):
            i, offset = carry_in

            # place the sequence into the padded buffer at the traced offset; out-of-range
            # positions replicate the clip's edge frames (clamped gather). Edge replication
            # — not zero fill — matters twice: it approximates the reference's SHORTER
            # boundary chunks (get_chunks, reference :526-533) better than zero frames the
            # temporal attention would attend to, and all-zero frames make zero-variance
            # GroupNorm groups whose 1/sqrt(var+eps) amplifies fp32 noise ~1e3x per norm
            # layer into chaotic batch-size-dependent outputs (found via the
            # sequential-CFG equivalence test)
            src = jnp.clip(frame_pos - offset, 0, T - 1)
            chunks = latents[src].reshape(NC, K, *latents.shape[1:])  # (NC, K, h, w, 4)

            # per-chunk first/last VALID frame (clamped into the live range)
            c0 = jnp.arange(NC) * K
            first_ids = jnp.clip(jnp.maximum(c0, offset) - offset, 0, T - 1)
            last_ids = jnp.clip(jnp.minimum(c0 + K - 1, offset + T - 1) - offset, 0, T - 1)

            fwd = chunks
            bwd = chunks[:, ::-1]
            g = jnp.linspace(cfg.min_guidance_scale, cfg.max_guidance_scale, K)

            if sequential:
                # sequential-CFG deployment switch (see pipelines/svd.py): the joint
                # [fwd, bwd] stream pair runs once per CFG side through one compiled
                # UNet body (halved stream masks), halving peak live activations;
                # bit-equivalent to the 4NC batch below
                lat_half = jnp.concatenate([fwd, bwd], axis=0)  # (2NC, K, ...)
                scaled = scheduler.scale_model_input(schedule, lat_half, i).astype(self.dtype)
                cond_pair = jnp.stack([
                    jnp.broadcast_to(zero_lat, (2 * NC,) + zero_lat.shape[1:]),
                    jnp.concatenate([cond_latents[first_ids], cond_latents[last_ids]],
                                    axis=0)])
                emb_pair = jnp.stack([
                    jnp.broadcast_to(zero_emb, (2 * NC,) + zero_emb.shape[1:]),
                    jnp.concatenate([image_embeddings[first_ids], image_embeddings[last_ids]],
                                    axis=0)])

                def half(args):
                    cond_r, emb_r = args
                    c = jnp.repeat(cond_r[:, None], K, axis=1).astype(self.dtype)
                    m = jnp.concatenate([scaled, c], axis=-1)
                    return self.unet_seq.apply(params["unet"], m, schedule.timesteps[i],
                                               emb_r, ati_half)

                eps = jax.lax.map(half, (cond_pair, emb_pair)).astype(jnp.float32)
                noise_pred = eps[0] + g[None, :, None, None, None] * (eps[1] - eps[0])
                noise_pred = noise_pred[:NC].reshape(padded, *latents.shape[1:])
                noise_pred = jax.lax.dynamic_slice(
                    noise_pred, (offset,) + (0,) * (latents.ndim - 1), latents.shape)
                latents, _ = scheduler.step(schedule, noise_pred, i, latents)
                return latents, ()

            lat_rows = jnp.concatenate([fwd, bwd, fwd, bwd], axis=0)  # (4NC, K, ...)
            cond_rows = jnp.concatenate([
                jnp.broadcast_to(zero_lat, (NC,) + zero_lat.shape[1:]),
                jnp.broadcast_to(zero_lat, (NC,) + zero_lat.shape[1:]),
                cond_latents[first_ids], cond_latents[last_ids]], axis=0)
            emb_rows = jnp.concatenate([
                jnp.broadcast_to(zero_emb, (NC,) + zero_emb.shape[1:]),
                jnp.broadcast_to(zero_emb, (NC,) + zero_emb.shape[1:]),
                image_embeddings[first_ids], image_embeddings[last_ids]], axis=0)
            cond_rows = jnp.repeat(cond_rows[:, None], K, axis=1)

            model_in = scheduler.scale_model_input(schedule, lat_rows, i)
            model_in = jnp.concatenate([model_in.astype(self.dtype),
                                        cond_rows.astype(self.dtype)], axis=-1)
            noise_pred = self.unet.apply(
                params["unet"], model_in, schedule.timesteps[i], emb_rows,
                added_time_ids).astype(jnp.float32)

            uncond, cond = jnp.split(noise_pred, 2, axis=0)
            noise_pred = uncond + g[None, :, None, None, None] * (cond - uncond)
            # keep the forward stream only (reference :593)
            noise_pred = noise_pred[:NC].reshape(padded, *latents.shape[1:])
            noise_pred = jax.lax.dynamic_slice(
                noise_pred, (offset,) + (0,) * (latents.ndim - 1), latents.shape)

            latents, _ = scheduler.step(schedule, noise_pred, i, latents)
            return latents, ()

        steps = jnp.arange(self.start_step, schedule.num_steps)
        latents, _ = jax.lax.scan(step_fn, latents, (steps, offsets))
        return latents[None]

    def __call__(self, params, video, rng: Optional[jax.Array] = None, output_type: str = "np"):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        video = jnp.asarray(video, jnp.float32)
        assert video.shape[0] == self.total_frames, (
            f"pipeline compiled for {self.total_frames} frames, got {video.shape[0]}")
        latents = self._generate(params, video, rng)
        if output_type == "latent":
            return latents
        out = self._decode(params["vae"], latents)
        return np.asarray(out) if output_type == "np" else out
