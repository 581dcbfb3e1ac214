"""CogVideoX image-to-video pipeline with latent-knowledge conditioning.

Re-designs the reference's modified CogVideoXImageToVideoPipeline
(`/root/reference/CogVideo-main/finetune/models/cogvideox_i2v/pipeline_cogvideox_image2video.py`):
T5 text conditioning (fused with domain/flow MAE features inside the transformer), the
first-frame VAE latent broadcast as a channel-concatenated condition (zeros on later
frames), CFG doubling with optional dynamic guidance, and a DDIM ``lax.scan`` loop.

The pipeline operates at the latent level; VAE encode/decode hooks take the CogVideoX
causal-3D VAE (models/vae_cogvideox.py) when provided, otherwise callers supply latents
directly (the reference trainer precomputes latents the same way —
`finetune/datasets/i2v_dataset.py:102-124`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D
from lkgd_tpu.schedulers.cogvideox_ddim import CogVideoXDDIMConfig, CogVideoXDDIMScheduler


@dataclasses.dataclass(frozen=True)
class CogVideoXPipelineConfig:
    height: int = 480
    width: int = 720
    num_frames: int = 49  # pixel frames
    num_inference_steps: int = 50
    guidance_scale: float = 6.0
    use_dynamic_cfg: bool = True
    scheduler: str = "ddim"  # "ddim" | "dpm" (reference cli_demo.py:135-140 recommends
    # CogVideoXDPMScheduler + dynamic CFG for the 5B checkpoints)
    vae_scale_factor_spatial: int = 8
    vae_scaling_factor: float = 0.7  # CogVideoX latent scaling (1/1.15258426 ~ invstd)

    @property
    def latent_frames(self) -> int:
        return (self.num_frames - 1) // 4 + 1

    @property
    def latent_height(self) -> int:
        return self.height // self.vae_scale_factor_spatial

    @property
    def latent_width(self) -> int:
        return self.width // self.vae_scale_factor_spatial


class CogVideoXImageToVideoPipeline:
    """Latent-level I2V generation. ``params = {"transformer": ...}``.

    Call with precomputed ``prompt_embeds`` (B, 226, 4096), ``image_latents`` (B, h, w, 16)
    and optional domain/flow features; returns denoised video latents (B, F, h, w, 16).
    """

    def __init__(self, config: CogVideoXPipelineConfig = CogVideoXPipelineConfig(),
                 transformer_config: CogVideoXConfig = CogVideoXConfig(),
                 scheduler_config: CogVideoXDDIMConfig = CogVideoXDDIMConfig(),
                 dtype: jnp.dtype = jnp.bfloat16, mesh=None):
        """``mesh``: optional Mesh for SPMD inference (the xDiT analog): CFG batch shards
        over 'data', latent frames over 'context' (XLA inserts the collectives the joint
        text+video attention needs)."""
        self.config = config
        self.mesh = mesh
        self.dtype = dtype
        self.transformer = CogVideoXTransformer3D(transformer_config, dtype=dtype)
        if config.scheduler == "dpm":
            from lkgd_tpu.schedulers.cogvideox_dpm import CogVideoXDPMScheduler

            self.scheduler = CogVideoXDPMScheduler(scheduler_config)
        elif config.scheduler == "ddim":
            self.scheduler = CogVideoXDDIMScheduler(scheduler_config)
        else:
            raise ValueError(f"unknown scheduler {config.scheduler!r}")
        self.schedule = self.scheduler.set_timesteps(config.num_inference_steps)
        # CogVideoX 1.5 temporal patching: pad the latent clip up to a patch_size_t
        # multiple (diffusers pipeline additional_frames; trim the extra decoded
        # frames after the VAE)
        pt = transformer_config.patch_size_t
        lf = config.latent_frames
        self.latent_frames = lf if not pt else -(-lf // pt) * pt
        self._generate = jax.jit(self._generate_impl)

    def init_params(self, rng: jax.Array) -> dict:
        cfg = self.config
        tcfg = self.transformer.config
        latents = jnp.zeros((2, self.latent_frames, cfg.latent_height,
                             cfg.latent_width, tcfg.in_channels), self.dtype)
        prompt = jnp.zeros((2, tcfg.max_text_seq_length, tcfg.text_embed_dim), self.dtype)
        dom = jnp.zeros((2, 1, 1000), self.dtype)
        return {"transformer": self.transformer.init(
            rng, latents, prompt, jnp.zeros((2,)), domain_features=dom, flow_features=dom)}

    def _denoise(self, params, prompt_embeds, negative_prompt_embeds, rng, img=None,
                 domain_features=None, flow_features=None, init_latents=None,
                 start_index: int = 0):
        """The shared DDIM loop: CFG doubling + dynamic guidance + ``lax.scan``.

        ``img``: optional (B, F, h, w, C) channel-concatenated condition (I2V).
        ``init_latents``/``start_index``: start mid-schedule from given noised latents
        (V2V SDEdit) instead of pure noise at step 0."""
        cfg = self.config
        b = prompt_embeds.shape[0]
        f = self.latent_frames

        if init_latents is None:
            latents = jax.random.normal(
                rng, (b, f, cfg.latent_height, cfg.latent_width,
                      self.transformer.config.out_channels), jnp.float32)
        else:
            latents = init_latents.astype(jnp.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = [None] * latents.ndim
            if "data" in self.mesh.axis_names and latents.shape[0] % self.mesh.shape["data"] == 0:
                axes[0] = "data"
            if "context" in self.mesh.axis_names and f % self.mesh.shape["context"] == 0:
                axes[1] = "context"
            latents = jax.lax.with_sharding_constraint(
                latents, NamedSharding(self.mesh, P(*axes)))

        do_cfg = cfg.guidance_scale > 1.0
        ctx = (jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
               if do_cfg else prompt_embeds).astype(self.dtype)
        img_rows = None
        if img is not None:
            img_rows = (jnp.concatenate([img, img], axis=0)
                        if do_cfg else img).astype(self.dtype)

        schedule, scheduler = self.schedule, self.scheduler
        n = schedule.num_steps
        dpm = cfg.scheduler == "dpm"
        sde_rng = jax.random.fold_in(rng, 0x0D9B) if dpm else None

        def predict(latents, i):
            t = schedule.timesteps[i]
            model_in = (jnp.concatenate([latents] * 2, axis=0)
                        if do_cfg else latents).astype(self.dtype)
            if img_rows is not None:
                model_in = jnp.concatenate([model_in, img_rows], axis=-1)
            pred = self.transformer.apply(
                params["transformer"], model_in, ctx,
                jnp.full((model_in.shape[0],), t, jnp.float32),
                domain_features=domain_features, flow_features=flow_features,
            ).astype(jnp.float32)
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                if cfg.use_dynamic_cfg:  # reference pipeline dynamic cfg (1 + g*(...cos ramp))
                    g = 1.0 + (cfg.guidance_scale - 1.0) * (
                        (1.0 - jnp.cos(jnp.pi * ((n - i.astype(jnp.float32)) / n) ** 5.0)) / 2.0)
                else:
                    g = cfg.guidance_scale
                pred = uncond + g * (cond - uncond)
            return pred

        if dpm:
            def step_fn(carry, i):
                latents, old_x0 = carry
                pred = predict(latents, i)
                noise = jax.random.normal(jax.random.fold_in(sde_rng, i),
                                          latents.shape, jnp.float32)
                # V2V starts mid-schedule with no x0 history: guard the 2M branch
                latents, x0 = scheduler.step(schedule, pred, old_x0, i, latents, noise,
                                             have_history=i > start_index)
                return (latents, x0), ()

            (latents, _), _ = jax.lax.scan(
                step_fn, (latents, jnp.zeros_like(latents)),
                jnp.arange(start_index, n))
        else:
            def step_fn(latents, i):
                latents, _ = scheduler.step(schedule, predict(latents, i), i, latents)
                return latents, ()

            latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(start_index, n))
        return latents

    def _segment_impl(self, params, latents, ctx, img_rows, idx,
                      domain_features=None, flow_features=None):
        """One K-step DDIM segment with the step indices ``idx`` passed as DATA, so a
        single compiled program serves every segment. Serving knob for runtimes that
        bound single-dispatch execution time (the axon TPU relay kills executions
        past ~1 min — measured r5: the 50-step 5B scan is a ~360 s single dispatch and
        crashes the worker; 5-step segments run clean). Semantically identical to the
        one-scan path: same predict/step ops, indices merely arrive as an array."""
        cfg = self.config
        schedule, scheduler = self.schedule, self.scheduler
        n = schedule.num_steps
        do_cfg = cfg.guidance_scale > 1.0

        def predict(latents, i):
            t = schedule.timesteps[i]
            model_in = (jnp.concatenate([latents] * 2, axis=0)
                        if do_cfg else latents).astype(self.dtype)
            if img_rows is not None:
                model_in = jnp.concatenate([model_in, img_rows], axis=-1)
            pred = self.transformer.apply(
                params["transformer"], model_in, ctx,
                jnp.full((model_in.shape[0],), t, jnp.float32),
                domain_features=domain_features, flow_features=flow_features,
            ).astype(jnp.float32)
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                if cfg.use_dynamic_cfg:
                    g = 1.0 + (cfg.guidance_scale - 1.0) * (
                        (1.0 - jnp.cos(jnp.pi * ((n - i.astype(jnp.float32)) / n) ** 5.0)) / 2.0)
                else:
                    g = cfg.guidance_scale
                pred = uncond + g * (cond - uncond)
            return pred

        def step_fn(latents, i):
            latents, _ = scheduler.step(schedule, predict(latents, i), i, latents)
            return latents, ()

        latents, _ = jax.lax.scan(step_fn, latents, idx)
        return latents

    def generate_segmented(self, params, prompt_embeds, image_latents,
                           negative_prompt_embeds=None, rng=None,
                           segment_steps: int = 5,
                           domain_features=None, flow_features=None):
        """DDIM generation dispatched in ``segment_steps``-step chunks (see
        _segment_impl). Only the ddim scheduler is supported (the dpm path carries SDE
        noise history keyed on the global step — use the one-scan path for it)."""
        if self.config.scheduler != "ddim":
            raise ValueError("generate_segmented supports the ddim scheduler only")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        prompt_embeds = jnp.asarray(prompt_embeds)
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        cfg = self.config
        b, f = prompt_embeds.shape[0], self.latent_frames
        image_latents = jnp.asarray(image_latents)
        img = jnp.concatenate([
            image_latents[:, None],
            jnp.zeros((b, f - 1) + image_latents.shape[1:], image_latents.dtype)], axis=1)
        do_cfg = cfg.guidance_scale > 1.0
        ctx = (jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
               if do_cfg else prompt_embeds).astype(self.dtype)
        img_rows = (jnp.concatenate([img, img], axis=0) if do_cfg else img).astype(self.dtype)
        latents = jax.random.normal(
            rng, (b, f, cfg.latent_height, cfg.latent_width,
                  self.transformer.config.out_channels), jnp.float32)
        if not hasattr(self, "_segment"):
            self._segment = jax.jit(self._segment_impl)
        n = self.schedule.num_steps
        for s in range(0, n, segment_steps):
            idx = jnp.arange(s, min(s + segment_steps, n), dtype=jnp.int32)
            if idx.shape[0] != segment_steps:  # ragged tail: ONE extra (1,)-shaped
                # program reused for each remaining step
                for j in range(int(idx.shape[0])):
                    latents = self._segment(params, latents, ctx, img_rows, idx[j:j + 1],
                                            domain_features, flow_features)
            else:
                latents = self._segment(params, latents, ctx, img_rows, idx,
                                        domain_features, flow_features)
        return latents

    def _generate_impl(self, params, prompt_embeds, negative_prompt_embeds, image_latents,
                       rng, domain_features=None, flow_features=None):
        # image conditioning: first-frame latents, zeros for the rest (I2V)
        b, f = prompt_embeds.shape[0], self.latent_frames
        img = jnp.concatenate([
            image_latents[:, None],
            jnp.zeros((b, f - 1) + image_latents.shape[1:], image_latents.dtype)], axis=1)
        return self._denoise(params, prompt_embeds, negative_prompt_embeds, rng, img=img,
                             domain_features=domain_features, flow_features=flow_features)

    def __call__(self, params, prompt_embeds, image_latents, negative_prompt_embeds=None,
                 rng: Optional[jax.Array] = None, domain_features=None, flow_features=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        prompt_embeds = jnp.asarray(prompt_embeds)
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        return np.asarray(self._generate(params, prompt_embeds, negative_prompt_embeds,
                                         jnp.asarray(image_latents), rng,
                                         domain_features, flow_features))


class CogVideoXTextToVideoPipeline(CogVideoXImageToVideoPipeline):
    """Latent-level T2V generation (reference CogVideoXPipeline,
    `CogVideo-main/inference/cli_demo.py:122`): the I2V loop without the channel-
    concatenated image condition — transformer ``in_channels`` must equal
    ``out_channels`` (16 for CogVideoX-2B/5B T2V checkpoints)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        tcfg = self.transformer.config
        if tcfg.in_channels != tcfg.out_channels:
            # fail at construction, not as a shape error deep inside the jitted loop
            raise ValueError(
                f"T2V/V2V take bare noise latents: transformer in_channels "
                f"({tcfg.in_channels}) must equal out_channels ({tcfg.out_channels}); "
                f"use dataclasses.replace(cfg, in_channels=cfg.out_channels)")

    def _generate_impl(self, params, prompt_embeds, negative_prompt_embeds, rng,
                       domain_features=None, flow_features=None):
        return self._denoise(params, prompt_embeds, negative_prompt_embeds, rng,
                             domain_features=domain_features, flow_features=flow_features)

    def __call__(self, params, prompt_embeds, negative_prompt_embeds=None,
                 rng: Optional[jax.Array] = None, domain_features=None, flow_features=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        prompt_embeds = jnp.asarray(prompt_embeds)
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        return np.asarray(self._generate(params, prompt_embeds, negative_prompt_embeds,
                                         rng, domain_features, flow_features))


class CogVideoXVideoToVideoPipeline(CogVideoXTextToVideoPipeline):
    """Latent-level V2V (reference CogVideoXVideoToVideoPipeline,
    `CogVideo-main/inference/cli_demo.py:124`): SDEdit — the input video's latents are
    noised to ``timesteps[int(n*(1-strength))]`` and re-denoised from there. ``strength``
    is static (it sets the scan length)."""

    def __init__(self, *args, strength: float = 0.8, **kwargs):
        super().__init__(*args, **kwargs)
        if not 0.0 < strength <= 1.0:
            raise ValueError(f"strength must be in (0, 1], got {strength}")
        self.strength = strength
        n = self.schedule.num_steps
        self.start_index = min(int(round(n * (1.0 - strength))), n - 1)
        self._generate_v2v = jax.jit(self._generate_v2v_impl)

    def _generate_v2v_impl(self, params, prompt_embeds, negative_prompt_embeds,
                           video_latents, rng, domain_features=None, flow_features=None):
        noise = jax.random.normal(rng, video_latents.shape, jnp.float32)
        t0 = jnp.full((video_latents.shape[0],), self.schedule.timesteps[self.start_index])
        init = self.scheduler.add_noise(video_latents.astype(jnp.float32), noise, t0)
        return self._denoise(params, prompt_embeds, negative_prompt_embeds, rng,
                             domain_features=domain_features, flow_features=flow_features,
                             init_latents=init, start_index=self.start_index)

    def __call__(self, params, prompt_embeds, video_latents, negative_prompt_embeds=None,
                 rng: Optional[jax.Array] = None, domain_features=None, flow_features=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        prompt_embeds = jnp.asarray(prompt_embeds)
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        return np.asarray(self._generate_v2v(params, prompt_embeds, negative_prompt_embeds,
                                             jnp.asarray(video_latents), rng,
                                             domain_features, flow_features))


def make_cogvideox_train_step(transformer: CogVideoXTransformer3D, optimizer,
                              scheduler: Optional[CogVideoXDDIMScheduler] = None,
                              mode: str = "i2v"):
    """v-prediction MSE train step (reference lora_trainer.py ``compute_loss``; the T2V
    variant per `finetune/models/cogvideox_t2v/lora_trainer.py:228` drops the
    channel-concatenated image condition).

    batch: latents (B,F,h,w,16) scaled, image_latents (B,h,w,16) (i2v only),
    prompt_embeds (B,L,4096), optional domain/flow features."""
    import optax

    from lkgd_tpu.training.train_state import TrainState

    sched = scheduler or CogVideoXDDIMScheduler()
    acp = jnp.asarray(sched.alphas_cumprod, jnp.float32)

    if mode not in ("i2v", "t2v"):
        raise ValueError(f"mode must be 'i2v' or 't2v', got {mode!r}")

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        b, f = latents.shape[:2]
        r_t, r_noise = jax.random.split(rng)
        timesteps = jax.random.randint(r_t, (b,), 0, acp.shape[0])
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        noisy = sched.add_noise(latents, noise, timesteps)
        target = sched.get_velocity(latents, noise, timesteps)

        if mode == "t2v":
            model_in = noisy
        else:
            img = jnp.concatenate([
                batch["image_latents"][:, None],
                jnp.zeros((b, f - 1) + batch["image_latents"].shape[1:], latents.dtype)],
                axis=1)
            model_in = jnp.concatenate([noisy, img], axis=-1)
        pred = transformer.apply(
            params, model_in, batch["prompt_embeds"], timesteps.astype(jnp.float32),
            domain_features=batch.get("domain_features"),
            flow_features=batch.get("flow_features"))
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state, state.ema_params), loss

    return train_step
