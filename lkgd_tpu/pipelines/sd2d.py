"""SD 2D image pipelines: inpaint, inpaint+ControlNet, test-time guidance optimization,
and the joint x<->y image+modality generators.

Re-designs the reference's 2D pipeline family (`/root/reference/pipeline/`):
  * ``pipeline_stable_diffusion_inpaint.py`` — masked inpainting with the 9-channel UNet
  * ``..._inpaint_controlnet.py`` — + ControlNet residuals
  * ``..._inpaint_guidance.py`` — test-time latent optimization: SGD on the latents
    against a guidance loss with ``guidance_lr``/``num_optimizer_steps``/``reg_weight``
    (reference :997-1007, optimize_latents :1558)
  * ``..._joint_control.py`` — joint image+modality generation by latent clamping: each
    step the condition stream's latents are replaced with the re-noised condition while
    joint attention couples the streams; direction via ``cond_x`` (reference :973-1016)
  * ``..._mask_control.py`` — same + spatial masks

All operate on prompt *embeddings* (text encoding is a separate host step via
models.clip_text), DDIM by default (CogVideoXDDIMConfig degenerates to standard DDIM with
snr_shift_scale=1, no zero-SNR rescale).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.models.controlnet_2d import ControlNet2D, ControlNet2DConfig
from lkgd_tpu.models.unet_2d import UNet2DCondition, UNet2DConfig
from lkgd_tpu.models.vae_2d import VAE2DConfig, AutoencoderKL
from lkgd_tpu.schedulers.cogvideox_ddim import CogVideoXDDIMConfig, CogVideoXDDIMScheduler


def sd_ddim_config(num_train_timesteps: int = 1000) -> CogVideoXDDIMConfig:
    """Standard SD DDIM (epsilon, scaled-linear betas, no SNR tricks)."""
    return CogVideoXDDIMConfig(num_train_timesteps=num_train_timesteps,
                               snr_shift_scale=1.0, rescale_betas_zero_snr=False,
                               timestep_spacing="leading", prediction_type="epsilon")


@dataclasses.dataclass(frozen=True)
class SD2DPipelineConfig:
    height: int = 512
    width: int = 512
    num_inference_steps: int = 50
    guidance_scale: float = 7.5


class StableDiffusionInpaintPipeline:
    """params = {"unet", "vae"}; prompt embeddings precomputed."""

    def __init__(self, config: SD2DPipelineConfig = SD2DPipelineConfig(),
                 unet_config: UNet2DConfig = UNet2DConfig(in_channels=9),
                 vae_config: VAE2DConfig = VAE2DConfig(),
                 controlnet_config: Optional[ControlNet2DConfig] = None,
                 dtype: jnp.dtype = jnp.float32):
        self.config = config
        self.dtype = dtype
        self.unet = UNet2DCondition(unet_config, dtype=dtype)
        self.vae = AutoencoderKL(vae_config, dtype=dtype)
        self.controlnet = (ControlNet2D(controlnet_config, dtype=dtype)
                           if controlnet_config else None)
        self.scheduler = CogVideoXDDIMScheduler(sd_ddim_config())
        self.schedule = self.scheduler.set_timesteps(config.num_inference_steps)
        self.vae_scale = 2 ** (len(vae_config.block_out_channels) - 1)
        self.vae_scaling = vae_config.scaling_factor
        self._generate = jax.jit(self._generate_impl)

    def init_params(self, rng: jax.Array, ctx_len: int = 8) -> dict:
        cfg = self.config
        h, w = cfg.height // self.vae_scale, cfg.width // self.vae_scale
        r1, r2, r3 = jax.random.split(rng, 3)
        s = len(self.unet.config.joint.mask) if self.unet.config.joint else 2
        sample = jnp.zeros((s, h, w, self.unet.config.in_channels), self.dtype)
        ehs = jnp.zeros((s, ctx_len, self.unet.config.cross_attention_dim), self.dtype)
        params = {
            "unet": self.unet.init(r1, sample, jnp.zeros((s,)), ehs),
            "vae": self.vae.init(r2, jnp.zeros((1, cfg.height, cfg.width, 3), self.dtype)),
        }
        if self.controlnet is not None:
            ctrl = jnp.zeros((s, cfg.height, cfg.width,
                              self.controlnet.config.conditioning_channels), self.dtype)
            params["controlnet"] = self.controlnet.init(
                r3, sample[..., :4], jnp.zeros((s,)), ehs, ctrl)
        return params

    # -------------------------------------------------------------- helpers
    def _encode(self, params, image: jnp.ndarray) -> jnp.ndarray:
        lat = self.vae.apply(params["vae"], image.astype(self.dtype),
                             method=AutoencoderKL.encode_mode)
        return lat.astype(jnp.float32) * self.vae_scaling

    def _decode(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        img = self.vae.apply(params["vae"], (latents / self.vae_scaling).astype(self.dtype),
                             method=AutoencoderKL.decode)
        return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    def _unet_eps(self, params, latents, mask_lat, masked_lat, t_rows, ehs, control=None):
        cfg = self.config
        rows = jnp.concatenate([latents] * 2, axis=0)
        model_in = jnp.concatenate(
            [rows.astype(self.dtype),
             jnp.concatenate([mask_lat] * 2, 0).astype(self.dtype),
             jnp.concatenate([masked_lat] * 2, 0).astype(self.dtype)], axis=-1)
        kwargs = {}
        if self.controlnet is not None and control is not None:
            down, mid = self.controlnet.apply(params["controlnet"], rows.astype(self.dtype),
                                              t_rows, ehs, control)
            kwargs = dict(down_block_additional_residuals=down,
                          mid_block_additional_residual=mid)
        eps = self.unet.apply(params["unet"], model_in, t_rows, ehs, **kwargs)
        uncond, cond = jnp.split(eps.astype(jnp.float32), 2, axis=0)
        return uncond + cfg.guidance_scale * (cond - uncond)

    # -------------------------------------------------------------- main
    def _generate_impl(self, params, prompt_embeds, negative_prompt_embeds, image, mask,
                       rng, control=None):
        """image [0,1] (B,H,W,3); mask (B,H,W,1) 1=repaint. Returns [0,1] images."""
        cfg = self.config
        b = image.shape[0]
        h, w = cfg.height // self.vae_scale, cfg.width // self.vae_scale

        masked = image * 2.0 - 1.0
        masked = masked * (1.0 - mask)
        masked_lat = self._encode(params, masked)
        mask_lat = jax.image.resize(mask, (b, h, w, 1), "nearest")

        ehs = jnp.concatenate([negative_prompt_embeds, prompt_embeds], 0).astype(self.dtype)
        if control is not None:
            control = jnp.concatenate([control] * 2, 0).astype(self.dtype)

        latents = jax.random.normal(rng, (b, h, w, 4), jnp.float32)
        schedule, scheduler = self.schedule, self.scheduler

        def step(latents, i):
            t = schedule.timesteps[i]
            t_rows = jnp.full((2 * b,), t, jnp.float32)
            eps = self._unet_eps(params, latents, mask_lat, masked_lat, t_rows, ehs, control)
            latents, _ = scheduler.step(schedule, eps, i, latents)
            return latents, ()

        latents, _ = jax.lax.scan(step, latents, jnp.arange(schedule.num_steps))
        return self._decode(params, latents)

    def __call__(self, params, prompt_embeds, image, mask, negative_prompt_embeds=None,
                 rng: Optional[jax.Array] = None, control=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        prompt_embeds = jnp.asarray(prompt_embeds)
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        return np.asarray(self._generate(params, prompt_embeds, negative_prompt_embeds,
                                         jnp.asarray(image, jnp.float32),
                                         jnp.asarray(mask, jnp.float32), rng,
                                         None if control is None else jnp.asarray(control)))

    # -------------------------------------------------------------- guidance variant
    def optimize_latents(self, latents: jnp.ndarray, guidance_fn: Callable[[jnp.ndarray], jnp.ndarray],
                         guidance_lr: float = 0.05, num_optimizer_steps: int = 5,
                         reg_weight: float = 1.0) -> jnp.ndarray:
        """Test-time latent optimization (reference inpaint_guidance optimize_latents
        :1558): SGD on the latents against ``guidance_fn`` with an L2 anchor to the
        original latents."""
        latents0 = latents

        def loss(z):
            return guidance_fn(z) + reg_weight * jnp.mean((z - latents0) ** 2)

        def body(z, _):
            g = jax.grad(loss)(z)
            return z - guidance_lr * g, ()

        z, _ = jax.lax.scan(body, latents, None, length=num_optimizer_steps)
        return z


class StableDiffusionJointControlPipeline:
    """Joint image+modality generation by latent clamping (reference
    ``pipeline_stable_diffusion_joint_control.py:973-1016``): batch = [x-stream, y-stream]
    (each CFG-doubled); the condition stream's latents are re-clamped every step to the
    (noise-free, t_cond=0) condition latents; per-stream timesteps; streams couple through
    the UNet's joint attention. ``cond_x=True`` conditions on the x half."""

    def __init__(self, config: SD2DPipelineConfig = SD2DPipelineConfig(),
                 unet_config: UNet2DConfig = UNet2DConfig(in_channels=4),
                 vae_config: VAE2DConfig = VAE2DConfig(),
                 cond_x: bool = True, dtype: jnp.dtype = jnp.float32):
        self.config = config
        self.dtype = dtype
        self.cond_x = cond_x
        self.unet = UNet2DCondition(unet_config, dtype=dtype)
        self.vae = AutoencoderKL(vae_config, dtype=dtype)
        self.scheduler = CogVideoXDDIMScheduler(sd_ddim_config())
        self.schedule = self.scheduler.set_timesteps(config.num_inference_steps)
        self.vae_scale = 2 ** (len(vae_config.block_out_channels) - 1)
        self.vae_scaling = vae_config.scaling_factor
        self._generate = jax.jit(self._generate_impl)

    def init_params(self, rng: jax.Array, ctx_len: int = 8) -> dict:
        cfg = self.config
        h, w = cfg.height // self.vae_scale, cfg.width // self.vae_scale
        r1, r2 = jax.random.split(rng)
        rows = len(self.unet.config.joint.mask) if self.unet.config.joint else 4
        sample = jnp.zeros((rows, h, w, self.unet.config.in_channels), self.dtype)
        ehs = jnp.zeros((rows, ctx_len, self.unet.config.cross_attention_dim), self.dtype)
        return {"unet": self.unet.init(r1, sample, jnp.zeros((rows,)), ehs),
                "vae": self.vae.init(r2, jnp.zeros((1, cfg.height, cfg.width, 3), self.dtype))}

    def _generate_impl(self, params, prompt_embeds, negative_prompt_embeds, condition_image,
                       rng, spatial_mask=None):
        cfg = self.config
        h, w = cfg.height // self.vae_scale, cfg.width // self.vae_scale
        b = condition_image.shape[0]  # pairs

        cond_lat = self.vae.apply(params["vae"], (condition_image * 2.0 - 1.0).astype(self.dtype),
                                  method=AutoencoderKL.encode_mode).astype(jnp.float32)
        cond_lat = cond_lat * self.vae_scaling

        rng_lat, rng_cn = jax.random.split(rng)
        # INTERLEAVED stream rows [x0, y0, x1, y1, ...] — matches the tiled joint
        # stream-mask convention used everywhere else in this framework
        latents = jax.random.normal(rng_lat, (2 * b, h, w, 4), jnp.float32)

        # stream-level conditioning mask: which stream of each pair is clamped
        pair = jnp.asarray([self.cond_x, not self.cond_x], bool)
        clamp = jnp.tile(pair, b)
        clamp_full = clamp[:, None, None, None]
        cond_rows = jnp.repeat(cond_lat, 2, axis=0)

        pe = jnp.repeat(prompt_embeds, 2, axis=0)  # per-stream copies
        ne = jnp.repeat(negative_prompt_embeds, 2, axis=0)
        ehs = jnp.concatenate([ne, pe], 0).astype(self.dtype)
        if spatial_mask is not None:
            smask = jax.image.resize(spatial_mask, (b, h, w, 1), "nearest")
            smask = jnp.repeat(smask, 2, axis=0)

        schedule, scheduler = self.schedule, self.scheduler

        def step(latents, i):
            t = schedule.timesteps[i].astype(jnp.float32)
            # clamp the condition stream (t_cond = 0: essentially clean condition)
            region = clamp_full if spatial_mask is None else clamp_full * smask
            latents = jnp.where(region, cond_rows, latents)
            t_rows = jnp.where(clamp, 0.0, t)  # per-stream timesteps
            model_in = jnp.concatenate([latents] * 2, axis=0).astype(self.dtype)
            t_all = jnp.concatenate([t_rows] * 2, axis=0)
            eps = self.unet.apply(params["unet"], model_in, t_all, ehs).astype(jnp.float32)
            uncond, cond = jnp.split(eps, 2, axis=0)
            eps = uncond + cfg.guidance_scale * (cond - uncond)
            latents, _ = scheduler.step(schedule, eps, i, latents)
            return latents, ()

        latents, _ = jax.lax.scan(step, latents, jnp.arange(schedule.num_steps))
        latents = jnp.where(clamp_full, cond_rows, latents)
        img = self.vae.apply(params["vae"], (latents / self.vae_scaling).astype(self.dtype),
                             method=AutoencoderKL.decode)
        return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    def __call__(self, params, prompt_embeds, condition_image, negative_prompt_embeds=None,
                 rng: Optional[jax.Array] = None, spatial_mask=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        prompt_embeds = jnp.asarray(prompt_embeds)
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        return np.asarray(self._generate(
            params, prompt_embeds, negative_prompt_embeds,
            jnp.asarray(condition_image, jnp.float32), rng,
            None if spatial_mask is None else jnp.asarray(spatial_mask, jnp.float32)))


class StableDiffusionConditionPipeline:
    """Plain text2img generation with an image-space extra conditioning input — the
    distinct "condition" pipeline of the reference family
    (``pipeline_stable_diffusion_condition.py``, used with
    ``models/unet_2d_condition_cond.py:70-118``'s ``UNet2DConditionAddCondModel``): the
    condition image runs through the UNet's small conv ``ConditioningEmbedding`` encoder
    and is added at ``conv_in`` resolution; everything else is the standard 4-channel SD
    CFG loop. Pass ``unet_config.cond_embedding_channels`` to enable the cond encoder."""

    def __init__(self, config: SD2DPipelineConfig = SD2DPipelineConfig(),
                 unet_config: UNet2DConfig = UNet2DConfig(
                     in_channels=4, cond_embedding_channels=3),
                 vae_config: VAE2DConfig = VAE2DConfig(),
                 dtype: jnp.dtype = jnp.float32):
        self.config = config
        self.dtype = dtype
        self.unet = UNet2DCondition(unet_config, dtype=dtype)
        self.vae = AutoencoderKL(vae_config, dtype=dtype)
        self.scheduler = CogVideoXDDIMScheduler(sd_ddim_config())
        self.schedule = self.scheduler.set_timesteps(config.num_inference_steps)
        self.vae_scale = 2 ** (len(vae_config.block_out_channels) - 1)
        self.vae_scaling = vae_config.scaling_factor
        self._generate = jax.jit(self._generate_impl)

    def init_params(self, rng: jax.Array, ctx_len: int = 8) -> dict:
        cfg = self.config
        h, w = cfg.height // self.vae_scale, cfg.width // self.vae_scale
        r1, r2 = jax.random.split(rng)
        sample = jnp.zeros((2, h, w, self.unet.config.in_channels), self.dtype)
        ehs = jnp.zeros((2, ctx_len, self.unet.config.cross_attention_dim), self.dtype)
        kw = {}
        if self.unet.config.cond_embedding_channels is not None:
            kw["cond_image"] = jnp.zeros(
                (2, cfg.height, cfg.width, self.unet.config.cond_embedding_channels),
                self.dtype)
        return {"unet": self.unet.init(r1, sample, jnp.zeros((2,)), ehs, **kw),
                "vae": self.vae.init(r2, jnp.zeros((1, cfg.height, cfg.width, 3), self.dtype))}

    def _generate_impl(self, params, prompt_embeds, negative_prompt_embeds, cond_image, rng):
        cfg = self.config
        b = prompt_embeds.shape[0]
        h, w = cfg.height // self.vae_scale, cfg.width // self.vae_scale

        ehs = jnp.concatenate([negative_prompt_embeds, prompt_embeds], 0).astype(self.dtype)
        kwargs = {}
        if cond_image is not None:
            # conditioning applies to the cond rows only; uncond rows see zeros (CFG
            # dropout convention of the reference's conditioning embedder)
            cond = cond_image.astype(self.dtype)
            kwargs["cond_image"] = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)

        latents = jax.random.normal(rng, (b, h, w, 4), jnp.float32)
        schedule, scheduler = self.schedule, self.scheduler

        def step(latents, i):
            t_rows = jnp.full((2 * b,), schedule.timesteps[i], jnp.float32)
            model_in = jnp.concatenate([latents] * 2, axis=0).astype(self.dtype)
            eps = self.unet.apply(params["unet"], model_in, t_rows, ehs, **kwargs)
            uncond, cond_eps = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            eps = uncond + cfg.guidance_scale * (cond_eps - uncond)
            latents, _ = scheduler.step(schedule, eps, i, latents)
            return latents, ()

        latents, _ = jax.lax.scan(step, latents, jnp.arange(schedule.num_steps))
        img = self.vae.apply(params["vae"], (latents / self.vae_scaling).astype(self.dtype),
                             method=AutoencoderKL.decode)
        return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    def __call__(self, params, prompt_embeds, cond_image=None, negative_prompt_embeds=None,
                 rng: Optional[jax.Array] = None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        prompt_embeds = jnp.asarray(prompt_embeds)
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        return np.asarray(self._generate(
            params, prompt_embeds, negative_prompt_embeds,
            None if cond_image is None else jnp.asarray(cond_image, jnp.float32), rng))
