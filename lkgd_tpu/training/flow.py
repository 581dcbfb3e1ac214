"""Flow-video diffusion training: batch preparation with on-the-fly UniMatch
pseudo-labels (reference ``train_models/train_svd_of.py:1403-1557``,
``train_svd_of_fix.py:1443-1557``, ``train_svd_of_lora.py``).

The reference computes flow inside its fused train loop; here the pseudo-labeling +
encoding is a separate jitted function producing the standard batch dict consumed by
``make_svd_train_step`` — the EDM loss itself is unchanged, only what the latents ARE
differs:

- mode="of":      latents = normalized flow-video latents, cond = first RGB frame.
- mode="of_fix":  cond additionally carries the first-transition flow image
                  (8 cond channels -> the dual-conv_in UNet, config
                  ``dual_cond_conv_in=True``).
- joint video+flow ("of_lora"): ``make_joint_vf_batch`` stacks the video and flow
  streams as batch rows (joint attention couples them; adapters route per row).

Frozen encoder params travel as ARGUMENTS (closing over them captures the whole VAE
as jaxpr constants).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder
from lkgd_tpu.utils.flow_codec import flow_latent_normalize, flow_to_image_naive


def make_flow_batch_fn(flow_fn: Callable, vae, mode: str = "of",
                       scaling: float = 0.18215, noise_aug: float = 0.02):
    """Returns jitted ``prep(vae_params, frames, image_embeddings, rng) -> batch``.

    ``flow_fn``: (T, H, W, 3) [0,1] -> (T-1, H, W, 2) (see utils.optical_flow.make_flow_fn).
    ``frames``: (B, T+1, H, W, 3) in [-1, 1]; T flows/latent frames are produced.
    """
    assert mode in ("of", "of_fix")

    def encode(p, x):
        return vae.apply(p, x, method=AutoencoderKLTemporalDecoder.encode_mode)

    @jax.jit
    def prep(vae_params, frames, image_embeddings, rng):
        b, tp1, h, w, _ = frames.shape
        t = tp1 - 1
        vid01 = (frames + 1.0) / 2.0
        flows = jax.vmap(flow_fn)(vid01)  # (B, T, H, W, 2)
        flow_imgs = flow_to_image_naive(flows) * 2.0 - 1.0  # VAE domain [-1, 1]
        flat = flow_imgs.reshape((b * t, h, w, 3))
        enc = encode(vae_params, flat)
        flow_lat = enc.reshape((b, t) + enc.shape[1:])
        # diffused latents = normalized, SCALED flow latents (train_svd_of.py:1427-1433)
        latents = flow_latent_normalize(flow_lat * scaling)

        first = frames[:, 0]
        noise = jax.random.normal(rng, first.shape, jnp.float32) * noise_aug
        cond = encode(vae_params, first + noise)  # unscaled posterior mode
        if mode == "of_fix":
            cond_flow = encode(vae_params, flow_imgs[:, 0])
            cond = jnp.concatenate([cond_flow, cond], axis=-1)  # flow | rgb order
        return {"latents": latents, "cond_latents": cond,
                "image_embeddings": image_embeddings}

    return prep


def make_joint_vf_batch(video_latents: jnp.ndarray, flow_latents: jnp.ndarray,
                        image_embeddings: jnp.ndarray) -> dict:
    """Joint video+flow rows for the of_lora trainer, INTERLEAVED [v0,f0,v1,f1,...]
    so the tiled stream masks pair each video row with its flow row (reference
    train_svd_of_lora.py couples the streams via xy/yx adapter masks). Latents must
    already be scaled/normalized. Pass ``tie_stream_pairs=True`` to the train config
    so coupled rows share sigmas."""
    lat = jnp.stack([video_latents, flow_latents], axis=1)
    lat = lat.reshape((-1,) + lat.shape[2:])
    return {"latents": lat, "image_embeddings": jnp.repeat(image_embeddings, 2, axis=0)}
