"""Plain-torch transcription of the FULL reference SVD pipeline ``__call__`` —
the end-to-end parity oracle.

Transcribed independently from
`/root/reference/pipeline/pipeline_stable_video_diffusion_trans.py`:
  * ``_resize_with_antialiasing`` + gaussian blur chain          (:661-766)
  * ``_encode_image`` CLIP chain ([-1,1] -> antialiased resize ->
    [0,1] -> CLIP normalize -> vision tower -> unsqueeze -> CFG)  (:157-203)
  * ``_encode_vae_image`` posterior mode + CFG zeros             (:205-226)
  * ``_get_add_time_ids`` (fps-1 applied by the caller :464)     (:228-253)
  * ``prepare_latents`` * init_noise_sigma                       (:297-328)
  * CFG-linspace guidance `_append_dims`                         (:524-535)
  * the denoising loop: batch-double, scale_model_input, channel
    concat, UNet, chunk(2) guidance combine, Euler step          (:541-575)
  * ``decode_latents`` chunked temporal decode + tensor2vid      (:256-283,80-99)
and the Euler-Karras scheduler
`/root/reference/utils/scheduling_euler_discrete_karras_fix.py` (SVD config:
scaled_linear betas are bypassed by the explicit sigma_min/max Karras ramp,
leading spacing => init_noise_sigma = sqrt(sigma_max^2+1), continuous
timesteps 0.25*log(sigma), v-prediction EDM step :418-528).

Model forwards come from the existing per-model torch oracles
(tests/torch_svd_unet_oracle.py, tests/test_vae_torch_oracle.py,
tests/test_clip_torch_oracle.py) so this module adds exactly the *pipeline
integration* semantics — conditioning order, scaling, indexing, guidance
broadcast — that the component oracles cannot check.
"""

import numpy as np
import torch
import torch.nn.functional as F

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


# --------------------------------------------------------------------- resize
def _gaussian_kernel1d(window_size: int, sigma: float) -> torch.Tensor:
    x = torch.arange(window_size, dtype=torch.float32) - window_size // 2
    if window_size % 2 == 0:
        x = x + 0.5
    g = torch.exp(-x.pow(2.0) / (2 * sigma * sigma))
    return g / g.sum()


def _filter2d(x: torch.Tensor, kernel: torch.Tensor) -> torch.Tensor:
    """Depthwise reflect-padded correlation (reference ``_filter2d`` :713-735)."""
    b, c, h, w = x.shape
    kh, kw = kernel.shape[-2:]
    pad = [(kw - 1) // 2, (kw - 1) - (kw - 1) // 2,
           (kh - 1) // 2, (kh - 1) - (kh - 1) // 2]
    x = F.pad(x, pad, mode="reflect")
    k = kernel.expand(c, 1, kh, kw)
    return F.conv2d(x, k, groups=c)


def resize_with_antialiasing(x: torch.Tensor, size) -> torch.Tensor:
    """Gaussian blur (sigma from the downscale factor) + bicubic align_corners=True
    (reference :661-688)."""
    h, w = x.shape[-2:]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001),
              max((factors[1] - 1.0) / 2.0, 0.001))
    ks = int(max(2.0 * 2 * sigmas[0], 3)), int(max(2.0 * 2 * sigmas[1], 3))
    ks = (ks[0] + 1 if ks[0] % 2 == 0 else ks[0],
          ks[1] + 1 if ks[1] % 2 == 0 else ks[1])
    kx = _gaussian_kernel1d(ks[1], sigmas[1])
    ky = _gaussian_kernel1d(ks[0], sigmas[0])
    x = _filter2d(x, kx[None, None, :])
    x = _filter2d(x, ky[None, :, None])
    return F.interpolate(x, size=size, mode="bicubic", align_corners=True)


# ------------------------------------------------------------------ scheduler
def svd_schedule(num_steps: int, sigma_min: float = 0.002, sigma_max: float = 700.0):
    """Karras rho=7 sigmas + continuous 0.25*log timesteps + leading-spacing init sigma.

    With explicit sigma_min/max the train-beta schedule never enters the inference
    sigmas (reference ``_convert_to_karras`` :376-399 reads only config sigma bounds).
    """
    rho = 7.0
    ramp = np.linspace(0, 1, num_steps)
    sigmas = (sigma_max ** (1 / rho) + ramp * (sigma_min ** (1 / rho)
                                               - sigma_max ** (1 / rho))) ** rho
    timesteps = 0.25 * np.log(sigmas)
    init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)  # leading spacing :249-256
    sigmas = np.append(sigmas, 0.0)
    return (torch.from_numpy(sigmas.astype(np.float32)),
            torch.from_numpy(timesteps.astype(np.float32)), init_noise_sigma)


def euler_step(model_output: torch.Tensor, sample: torch.Tensor, sigma: torch.Tensor,
               sigma_next: torch.Tensor) -> torch.Tensor:
    """Deterministic v-prediction EDM step (reference scheduler :418-528, s_churn=0)."""
    sample = sample.to(torch.float32)
    model_output = model_output.to(torch.float32)
    pred_original = model_output * (-sigma / (sigma ** 2 + 1) ** 0.5) + (
        sample / (sigma ** 2 + 1))
    derivative = (sample - pred_original) / sigma
    return sample + derivative * (sigma_next - sigma)


# ------------------------------------------------------------------- pipeline
def svd_pipeline_generate(
    unet_store, unet_cfg: dict, vae_sd: dict, vae_cfg, clip_store, clip_cfg,
    image: torch.Tensor,          # (B, 3, H, W) in [0, 1] at pipeline resolution
    noise_aug_noise: torch.Tensor,  # (B, 3, H, W) standard normal
    initial_noise: torch.Tensor,    # (B, T, 4, h, w) standard normal
    num_frames: int, num_inference_steps: int,
    min_guidance_scale: float = 1.0, max_guidance_scale: float = 3.0,
    fps: int = 7, motion_bucket_id: int = 127, noise_aug_strength: float = 0.02,
    joint: dict = None, lora_cfg: dict = None, joint_scale: float = 1.0,
    controlnet=None,
):
    """The reference ``__call__`` :435-575 up to (and returning) the denoised latents.

    ``controlnet``: optional callable
    ``(latent_model_input, t, image_embeddings, add_time_ids) -> (down_res, mid_res)``
    injected per step (the controlnet pipeline variants, reference
    pipeline_stable_video_diffusion_controlnet.py:585-600); the caller owns its
    transcription. Returns latents (B, T, 4, h, w) float32.
    """
    from tests.test_clip_torch_oracle import clip_vision_forward
    from tests.test_vae_torch_oracle import _torch_encode
    from tests.torch_svd_unet_oracle import unet_forward

    batch_size = image.shape[0]

    # 3. CLIP conditioning (:157-203, PIL path)
    x = image * 2.0 - 1.0
    x = resize_with_antialiasing(x, (clip_cfg.image_size, clip_cfg.image_size))
    x = (x + 1.0) / 2.0
    mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
    image_embeddings = clip_vision_forward(clip_store, clip_cfg,
                                           (x - mean) / std).unsqueeze(1)
    image_embeddings = torch.cat([torch.zeros_like(image_embeddings),
                                  image_embeddings])

    # 4. VAE conditioning on the noise-augmented image (:464-488); posterior mode,
    # unscaled (:205-226)
    img = image * 2.0 - 1.0 + noise_aug_strength * noise_aug_noise
    moments = _torch_encode(vae_sd, vae_cfg, img.numpy())
    image_latents = moments[:, :vae_cfg.latent_channels]
    image_latents = torch.cat([torch.zeros_like(image_latents), image_latents])
    image_latents = image_latents.unsqueeze(1).repeat(1, num_frames, 1, 1, 1)

    # 5. added time ids, fps-1 (:462-464, :228-253)
    add_time_ids = torch.tensor(
        [[fps - 1, motion_bucket_id, noise_aug_strength]], dtype=torch.float32)
    add_time_ids = add_time_ids.repeat(batch_size, 1)
    add_time_ids = torch.cat([add_time_ids, add_time_ids])

    # 6-7. schedule + initial latents (:497-515)
    sigmas, timesteps, init_noise_sigma = svd_schedule(num_inference_steps)
    latents = initial_noise.to(torch.float32) * init_noise_sigma

    # 8. frame-linspace guidance (:524-535)
    guidance_scale = torch.linspace(min_guidance_scale, max_guidance_scale,
                                    num_frames).unsqueeze(0)
    guidance_scale = guidance_scale.repeat(batch_size, 1)
    guidance_scale = guidance_scale[(...,) + (None,) * (latents.ndim - 2)]

    # 9. denoising loop (:541-575)
    for i in range(num_inference_steps):
        latent_model_input = torch.cat([latents] * 2)
        latent_model_input = latent_model_input / (sigmas[i] ** 2 + 1) ** 0.5
        latent_model_input = torch.cat([latent_model_input, image_latents], dim=2)

        if controlnet is not None:
            down_res, mid_res = controlnet(latent_model_input, timesteps[i],
                                           image_embeddings, add_time_ids)
            from tests.test_controlnet_torch_oracle import unet_forward_with_residuals

            noise_pred = unet_forward_with_residuals(
                unet_store, unet_cfg, latent_model_input, timesteps[i],
                image_embeddings, add_time_ids, down_res, mid_res)
        else:
            noise_pred = unet_forward(unet_store, unet_cfg, latent_model_input,
                                      timesteps[i], image_embeddings, add_time_ids,
                                      joint=joint, lora_cfg=lora_cfg,
                                      joint_scale=joint_scale)
        uncond, cond = noise_pred.chunk(2)
        noise_pred = uncond + guidance_scale * (cond - uncond)
        latents = euler_step(noise_pred, latents, sigmas[i], sigmas[i + 1])
    return latents


def svd_decode_frames(vae_sd, vae_cfg, latents: torch.Tensor, num_frames: int,
                      decode_chunk_size: int) -> np.ndarray:
    """``decode_latents`` (:256-283) + tensor2vid np postprocess (:80-99):
    flat chunked temporal decode, (x/2+0.5).clamp(0,1), (B, T, H, W, C)."""
    from tests.test_vae_torch_oracle import _torch_decode

    flat = latents.flatten(0, 1) / vae_cfg.scaling_factor
    frames = []
    for i in range(0, flat.shape[0], decode_chunk_size):
        chunk = flat[i:i + decode_chunk_size]
        frames.append(_torch_decode(vae_sd, vae_cfg, chunk.numpy(), chunk.shape[0]))
    f = torch.cat(frames, dim=0)
    f = f.reshape(-1, num_frames, *f.shape[1:]).to(torch.float32)
    f = (f / 2 + 0.5).clamp(0, 1)
    return f.permute(0, 1, 3, 4, 2).numpy()
