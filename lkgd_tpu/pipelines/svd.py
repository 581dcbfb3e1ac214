"""Stable Video Diffusion pipelines — TPU-native image-to-video generation.

Re-designs the reference's diffusers-style pipelines
(`/root/reference/pipeline/pipeline_stable_video_diffusion_trans.py:114-656`) as thin host
orchestrators around ONE jitted program: CLIP/VAE conditioning encode, a ``lax.scan`` over
all denoising steps (CFG batch-double, EDM scale, channel-concat conditioning, UNet, guided
Euler step), and an equal-chunked temporal VAE decode — no Python in the hot loop, no
mutable scheduler state, fully compilable and shardable.

Pipelines provided (reference file → class):
  * img2vid base / "trans" frame-transition (joint attention is a UNet config choice here,
    not a runtime patch): ``StableVideoDiffusionPipeline``
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModelWithProjection, clip_normalize
from lkgd_tpu.models.configs import SVDUNetConfig
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder, TemporalVAEConfig
from lkgd_tpu.ops.resize import resize_with_antialiasing
from lkgd_tpu.schedulers.euler_discrete import EulerDiscreteConfig, EulerDiscreteScheduler


@dataclasses.dataclass(frozen=True)
class SVDPipelineConfig:
    """Static generation settings (defaults per reference
    `pipeline_stable_video_diffusion_trans.py:352-372` and BASELINE.md)."""

    height: int = 576
    width: int = 1024
    num_frames: int = 14
    num_inference_steps: int = 25
    min_guidance_scale: float = 1.0
    max_guidance_scale: float = 3.0
    fps: int = 7
    motion_bucket_id: int = 127
    noise_aug_strength: float = 0.02
    decode_chunk_size: int = 7
    do_classifier_free_guidance: bool = True
    # run the two CFG halves sequentially (lax.map over one UNet body) instead of
    # batch-doubled: same FLOPs, ~half the peak activation HBM — the deployment switch
    # for memory-tight configs (trans joint batches at 576x1024 on one 16 GB chip)
    sequential_cfg: bool = False
    # DeepCache (Ma et al., arXiv:2312.00858) opt-in serving accelerator: every N-th
    # step runs the full UNet and caches the deep trunk (input of the last up block);
    # intermediate steps recompute only the shallowest level against the current
    # latents. 1 = off (the exact/default path — the parity headline is unaffected).
    # APPROXIMATE when >1: outputs change; validate quality for your checkpoint.
    deep_cache_interval: int = 1



def equal_chunks(n: int, max_chunk: int) -> int:
    """Largest divisor of n that is <= max_chunk (equal-shape decode chunks: one compile)."""
    for c in range(min(max_chunk, n), 0, -1):
        if n % c == 0:
            return c
    return n


class StableVideoDiffusionPipeline:
    """Image -> video. ``generate`` runs two jitted programs: the conditioning-encode +
    denoise scan, then the chunked temporal VAE decode (separate so the decode can use
    whole-clip chunks — see ``generate``).

    Weights: ``params = {"unet": ..., "vae": ..., "image_encoder": ...}`` (flax param trees).
    """

    def __init__(
        self,
        config: SVDPipelineConfig = SVDPipelineConfig(),
        unet_config: SVDUNetConfig = SVDUNetConfig(),
        vae_config: TemporalVAEConfig = TemporalVAEConfig(),
        clip_config: CLIPVisionConfig = CLIPVisionConfig(),
        scheduler_config: EulerDiscreteConfig = EulerDiscreteConfig.svd(),
        dtype: jnp.dtype = jnp.bfloat16,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh for SPMD inference — the CFG/stream batch
        shards over 'data' and the frame axis over 'context' (ICI collectives handle
        temporal attention); params stay replicated. This is the v5e-8 deployment path
        behind BASELINE.json's <10s north star."""
        self.config = config
        self.mesh = mesh
        self.dtype = dtype
        self.unet = UNetSpatioTemporalCondition(unet_config, dtype=dtype)
        if config.sequential_cfg:
            # same params, stream masks halved for single-CFG-side rows
            from lkgd_tpu.models.configs import halve_stream_masks

            self.unet_seq = UNetSpatioTemporalCondition(halve_stream_masks(unet_config),
                                                        dtype=dtype)
        self.vae = AutoencoderKLTemporalDecoder(vae_config, dtype=dtype)
        self.image_encoder = CLIPVisionModelWithProjection(clip_config, dtype=dtype)
        self.scheduler = EulerDiscreteScheduler(scheduler_config)
        self.schedule = self.scheduler.set_timesteps(config.num_inference_steps)
        self.vae_scaling = vae_config.scaling_factor
        self.vae_scale_factor = 2 ** (len(vae_config.block_out_channels) - 1)
        self.latent_height = config.height // self.vae_scale_factor
        self.latent_width = config.width // self.vae_scale_factor
        self._generate = jax.jit(self._generate_impl)
        self._decode = jax.jit(self.decode_latents)

    # ------------------------------------------------------------------ param init
    def init_params(self, rng: jax.Array, batch_size: int = 1) -> dict:
        cfg = self.config
        r1, r2, r3 = jax.random.split(rng, 3)
        rows = 2 * batch_size
        if self.unet.config.joint is not None:
            # batch must be a multiple of the joint stream count to trace
            s = len(self.unet.config.joint.mask)
            rows = max(rows, s) // s * s
        sample = jnp.zeros((rows, cfg.num_frames, self.latent_height, self.latent_width,
                            self.unet.config.in_channels), self.dtype)
        ehs = jnp.zeros((rows, 1, self.unet.config.cross_attention_dim), self.dtype)
        unet_params = self.unet.init(r1, sample, jnp.zeros((rows,)), ehs,
                                     jnp.zeros((rows, 3)))
        vae_params = self.vae.init(r2, jnp.zeros((1, cfg.height, cfg.width, 3), self.dtype),
                                   num_frames=1)
        clip_params = self.image_encoder.init(
            r3, jnp.zeros((1, self.image_encoder.config.image_size,
                           self.image_encoder.config.image_size, 3), self.dtype))
        return {"unet": unet_params, "vae": vae_params, "image_encoder": clip_params}

    # ------------------------------------------------------------------ conditioning
    def _encode_clip(self, params, image: jnp.ndarray) -> jnp.ndarray:
        """[0,1] (B,H,W,3) -> CLIP image embeddings (B, 1, D). Matches reference
        ``_encode_image`` (:157-203): [-1,1] -> antialiased 224^2 -> [0,1] -> normalize."""
        size = self.image_encoder.config.image_size
        x = image * 2.0 - 1.0
        x = resize_with_antialiasing(x, (size, size))
        x = (x + 1.0) / 2.0
        x = clip_normalize(x)
        emb = self.image_encoder.apply(params, x.astype(self.dtype))
        return emb[:, None, :]

    def _encode_vae_cond(self, params, image: jnp.ndarray) -> jnp.ndarray:
        """[-1,1] (B,H,W,3) -> posterior-mode latents (B,h,w,4), *unscaled* — the reference
        conditions on unscaled latents (:205-226 uses latent_dist.mode() directly)."""
        return self.vae.apply(params, image.astype(self.dtype),
                              method=AutoencoderKLTemporalDecoder.encode_mode)

    def _add_time_ids(self, batch_size: int) -> jnp.ndarray:
        cfg = self.config
        ids = jnp.asarray([[cfg.fps - 1, cfg.motion_bucket_id, cfg.noise_aug_strength]],
                          jnp.float32)
        return jnp.tile(ids, (batch_size, 1))

    def _guidance_scale(self, batch_size: int) -> jnp.ndarray:
        cfg = self.config
        g = jnp.linspace(cfg.min_guidance_scale, cfg.max_guidance_scale, cfg.num_frames)
        g = jnp.tile(g[None], (batch_size, 1))
        return g[..., None, None, None]  # (B, T, 1, 1, 1)

    # ------------------------------------------------------------------ generation
    def _generate_impl(self, params, image: jnp.ndarray, rng: jax.Array,
                       noise_aug: Optional[jnp.ndarray] = None,
                       initial_noise: Optional[jnp.ndarray] = None):
        """image: [0,1] (B, H, W, 3). Returns denoised latents (B, T, h, w, 4) — decoding
        runs in its own jitted program (``generate``).

        ``noise_aug`` / ``initial_noise``: optional pre-drawn standard normals (image
        shape / latent shape) replacing the internal PRNG draws — the deterministic-noise
        hook used by the end-to-end torch parity oracle (reference `__call__` takes the
        analogous ``generator``/``latents`` arguments, pipeline...trans.py:366-367)."""
        cfg = self.config
        batch_size = image.shape[0]
        rng_aug, rng_lat = jax.random.split(rng)

        # CLIP conditioning with CFG doubling (zeros for the unconditional half)
        image_embeddings = self._encode_clip(params["image_encoder"], image)
        if cfg.do_classifier_free_guidance:
            image_embeddings = jnp.concatenate(
                [jnp.zeros_like(image_embeddings), image_embeddings], axis=0)

        # VAE conditioning latents (noise-augmented image, reference :466-488)
        image_m11 = image * 2.0 - 1.0
        noise = (jax.random.normal(rng_aug, image_m11.shape, jnp.float32)
                 if noise_aug is None else noise_aug.astype(jnp.float32))
        image_aug = image_m11 + cfg.noise_aug_strength * noise
        image_latents = self._encode_vae_cond(params["vae"], image_aug)
        if cfg.do_classifier_free_guidance:
            image_latents = jnp.concatenate([jnp.zeros_like(image_latents), image_latents], axis=0)
        # (2B, h, w, 4) -> (2B, T, h, w, 4)
        image_latents = jnp.repeat(image_latents[:, None], cfg.num_frames, axis=1)

        added_time_ids = self._add_time_ids(
            batch_size * (2 if cfg.do_classifier_free_guidance else 1))

        # initial noise
        latents = (jax.random.normal(
            rng_lat, (batch_size, cfg.num_frames, self.latent_height, self.latent_width, 4),
            jnp.float32) if initial_noise is None
            else initial_noise.astype(jnp.float32)) * self.schedule.init_noise_sigma

        guidance = self._guidance_scale(batch_size)
        schedule = self.schedule
        scheduler = self.scheduler
        latents = self._shard_video(latents)
        image_latents = self._shard_video(image_latents)

        dc = int(getattr(cfg, "deep_cache_interval", 1) or 1)
        sequential = cfg.sequential_cfg and cfg.do_classifier_free_guidance
        if dc > 1 and sequential:
            raise ValueError("deep_cache_interval and sequential_cfg are mutually "
                             "exclusive (the cache spans the CFG-doubled batch)")
        if sequential:
            # (2B, ...) stream-major [uncond; cond] -> (2, B, ...) halves for lax.map
            emb_pair = image_embeddings.reshape(2, batch_size, *image_embeddings.shape[1:])
            ilat_pair = image_latents.reshape(2, batch_size, *image_latents.shape[1:])
            ati_pair = added_time_ids.reshape(2, batch_size, *added_time_ids.shape[1:])

        def step_fn(latents, i):
            t = schedule.timesteps[i]
            if sequential:
                scaled = scheduler.scale_model_input(schedule, latents, i).astype(self.dtype)

                def half(args):
                    emb, ilat, ati = args
                    m = jnp.concatenate([scaled, ilat], axis=-1)
                    return self.unet_seq.apply(params["unet"], m, t, emb, ati)

                # one compiled UNet body executed twice back-to-back: peak live
                # activations halve vs the batch-doubled call
                eps = jax.lax.map(half, (emb_pair, ilat_pair, ati_pair))
                eps = eps.astype(jnp.float32)
                noise_pred = eps[0] + guidance * (eps[1] - eps[0])
                latents, _ = scheduler.step(schedule, noise_pred, i, latents)
                return latents, ()
            if cfg.do_classifier_free_guidance:
                model_in = jnp.concatenate([latents] * 2, axis=0)
            else:
                model_in = latents
            model_in = scheduler.scale_model_input(schedule, model_in, i)
            model_in = jnp.concatenate([model_in.astype(self.dtype), image_latents], axis=-1)
            noise_pred = self.unet.apply(
                params["unet"], model_in, t, image_embeddings, added_time_ids)
            noise_pred = noise_pred.astype(jnp.float32)
            if cfg.do_classifier_free_guidance:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance * (cond - uncond)
            latents, _ = scheduler.step(schedule, noise_pred, i, latents)
            return latents, ()

        if dc > 1:
            # DeepCache scan: carry (latents, deep trunk feature); every dc-th step
            # refreshes the cache with a full pass (step 0 is always full)
            rows = batch_size * (2 if cfg.do_classifier_free_guidance else 1)
            ucfg = self.unet.config
            cache0 = jnp.zeros((rows * cfg.num_frames, self.latent_height,
                                self.latent_width, ucfg.block_out_channels[1]),
                               self.dtype)

            def step_fn_dc(carry, i):
                latents, cache = carry
                t = schedule.timesteps[i]
                model_in = (jnp.concatenate([latents] * 2, axis=0)
                            if cfg.do_classifier_free_guidance else latents)
                model_in = scheduler.scale_model_input(schedule, model_in, i)
                model_in = jnp.concatenate([model_in.astype(self.dtype), image_latents],
                                           axis=-1)

                def full(mc):
                    m, _ = mc
                    return self.unet.apply(params["unet"], m, t, image_embeddings,
                                           added_time_ids, return_deep_feature=True)

                def cached(mc):
                    m, c = mc
                    return self.unet.apply(params["unet"], m, t, image_embeddings,
                                           added_time_ids, deep_cache=c,
                                           return_deep_feature=True)

                noise_pred, cache = jax.lax.cond(i % dc == 0, full, cached,
                                                 (model_in, cache))
                noise_pred = noise_pred.astype(jnp.float32)
                if cfg.do_classifier_free_guidance:
                    uncond, cond = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance * (cond - uncond)
                latents, _ = scheduler.step(schedule, noise_pred, i, latents)
                return (latents, cache), ()

            (latents, _), _ = jax.lax.scan(step_fn_dc, (latents, cache0),
                                           jnp.arange(schedule.num_steps))
            return latents

        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(schedule.num_steps))
        return latents

    def _shard_video(self, x: jnp.ndarray) -> jnp.ndarray:
        """Constrain a (B, T, ...) video tensor to the mesh: batch over data, frames over
        context (no-op without a mesh). XLA propagates the layout through the UNet and
        inserts ICI collectives where temporal attention needs whole-sequence views."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = [None] * x.ndim
        if "data" in self.mesh.axis_names and x.shape[0] % self.mesh.shape["data"] == 0:
            axes[0] = "data"
        if ("context" in self.mesh.axis_names and x.ndim > 1
                and x.shape[1] % self.mesh.shape["context"] == 0):
            axes[1] = "context"
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, P(*axes)))

    def decode_latents(self, vae_params, latents: jnp.ndarray) -> jnp.ndarray:
        """(B, T, h, w, 4) -> [0,1] frames (B, T, H, W, 3), equal-chunk temporal decode
        (reference ``decode_latents`` :256-283 with fixed-size chunks for one compile)."""
        cfg = self.config
        b, t = latents.shape[:2]
        chunk = equal_chunks(t, cfg.decode_chunk_size)
        z = (latents / self.vae_scaling).astype(self.dtype)
        z = z.reshape(b * (t // chunk), chunk, *latents.shape[2:])

        def dec(zc):
            zc = zc.reshape((chunk,) + zc.shape[1:])
            return self.vae.apply(vae_params, zc, chunk,
                                  method=AutoencoderKLTemporalDecoder.decode)

        n_chunks = z.shape[0]
        ctx = (self.mesh.shape["context"] if self.mesh is not None
               and "context" in self.mesh.axis_names else 1)
        if ctx > 1 and n_chunks % ctx == 0:
            # chunks decode in PARALLEL across the mesh context axis, ctx at a time
            # (one chunk per device — the decode_chunk_size memory bound still holds
            # per chip), groups sequential via lax.map: decode wall-clock / ctx.
            # The reference's decode_chunk_size loop has no multi-GPU analog.
            from jax.sharding import NamedSharding, PartitionSpec as P

            zg = z.reshape(n_chunks // ctx, ctx, *z.shape[1:])
            zg = jax.lax.with_sharding_constraint(
                zg, NamedSharding(self.mesh, P(None, "context")))
            frames = jax.lax.map(jax.vmap(dec), zg)
            frames = frames.reshape(n_chunks, *frames.shape[2:])
        else:
            frames = jax.lax.map(dec, z)
        frames = frames.reshape(b, t, cfg.height, cfg.width, 3)
        return jnp.clip(frames.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    def generate(self, params, image: jnp.ndarray, rng: jax.Array,
                 noise_aug: Optional[jnp.ndarray] = None,
                 initial_noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Two-program generation: denoise scan (jit #1) + chunked temporal decode
        (jit #2). Splitting the decode out lets it run with large frame chunks (fewer
        memory passes; ~0.8 s faster per 14-frame clip at decode_chunk_size=14) that the
        combined program cannot compile at — see BASELINE.md."""
        latents = self._generate(params, image, rng, noise_aug, initial_noise)
        return self._decode(params["vae"], latents)

    # ------------------------------------------------------------------ public API
    def __call__(self, params, image, rng: Optional[jax.Array] = None,
                 output_type: str = "np", noise_aug: Optional[jnp.ndarray] = None,
                 initial_noise: Optional[jnp.ndarray] = None):
        """image: numpy/jax array (B, H, W, 3) in [0,1] at pipeline resolution."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if output_type == "latent":
            return self._generate(params, image, rng, noise_aug, initial_noise)
        out = self.generate(params, image, rng, noise_aug, initial_noise)
        if output_type == "np":
            return np.asarray(out)
        return out
