"""Training step construction: EDM video-diffusion fine-tuning, pjit-sharded.

Replaces the reference's accelerate/DeepSpeed training substrate
(`train_models/train_svd_lora.py:957-1873`) with a single donated, jitted ``train_step``:
EDM sigma sampling, conditioning dropout, channel-concat conditioning, UNet forward, EDM
weighted-MSE loss (training/edm.py), optax update — gradients all-reduce over the mesh's
``data`` axis by construction, frames shard over ``context``.

Trainable-parameter selection mirrors the reference's ``requires_grad`` partitions
(e.g. only ``quaternion*`` + LoRA adapters, `train_svd_lora.py:1068-1102`) via an optax
mask over param-path predicates; frozen params get zero updates and stay bit-identical.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from lkgd_tpu.training import edm


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def param_label_fn(trainable_predicate: Callable[[str], bool]):
    """Label params 'train'/'frozen' by their '/'-joined path."""

    def label(params):
        def one(path, _):
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            return "train" if trainable_predicate(p) else "frozen"

        return jax.tree_util.tree_map_with_path(one, params)

    return label


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 1e-2,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   max_grad_norm: float = 1.0,
                   trainable_predicate: Optional[Callable[[str], bool]] = None,
                   use_8bit: bool = False):
    """AdamW (+ global-norm clip) with optional trainable-param masking.

    The reference uses bitsandbytes AdamW8bit or torch AdamW
    (`train_svd_lora.py:1197-1217`); optax.adamw is the TPU equivalent and
    ``use_8bit=True`` selects the int8-moment variant (training/optim8bit.py, the
    AdamW8bit memory analog)."""
    if use_8bit:
        from lkgd_tpu.training.optim8bit import adamw8bit

        adam = adamw8bit(learning_rate, b1=b1, b2=b2, eps=eps,
                         weight_decay=weight_decay,
                         packed=(use_8bit == "packed"))
    else:
        adam = optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)
    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), adam)
    if trainable_predicate is None:
        return tx
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, param_label_fn(trainable_predicate))


@dataclasses.dataclass(frozen=True)
class SVDTrainConfig:
    edm: edm.EDMConfig = edm.EDMConfig()
    conditioning_dropout_prob: Optional[float] = 0.1
    train_noise_aug: float = 0.02  # reference train_svd_lora.py:1512
    fps: int = 6
    motion_bucket_id: int = 127
    # joint two-stream batches (INTERLEAVED [x0,y0,x1,y1,...] rows — our stream masks
    # tile over rows, so partners are adjacent): sample sigmas per pair and
    # repeat-interleave so coupled streams share noise levels
    # (train_svd_trans_lora.py:1404-1407 does the half-batch equivalent)
    tie_stream_pairs: bool = False


def make_svd_train_step(unet, optimizer, config: SVDTrainConfig = SVDTrainConfig()):
    """Build the jitted SVD train step.

    batch dict (device arrays):
      latents:        (B, T, h, w, 4)  scaled video latents (vae-encoded, *0.18215)
      cond_latents:   (B, h, w, 4)     unscaled first-frame posterior-mode latents
      image_embeddings: (B, 1, D)      CLIP embedding of the first frame
      domain_features / flow_features: (B, 1, K) or absent
    """

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        bsz, num_frames = latents.shape[0], latents.shape[1]
        r_sigma, r_noise, r_drop1, r_drop2 = jax.random.split(rng, 4)

        if config.tie_stream_pairs:
            sigmas = edm.rand_cosine_interpolated(r_sigma, (bsz // 2,), config.edm)
            sigmas = jnp.repeat(sigmas, 2, axis=0)
        else:
            sigmas = edm.rand_cosine_interpolated(r_sigma, (bsz,), config.edm)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        noisy, inp = edm.precondition_inputs(latents, noise, sigmas)
        timesteps = edm.timesteps_from_sigmas(sigmas)

        ehs = batch["image_embeddings"]
        cond_latents = batch["cond_latents"]

        # conditioning dropout for CFG (reference train_svd_lora.py:1553-1573)
        if config.conditioning_dropout_prob:
            p = config.conditioning_dropout_prob
            random_p = jax.random.uniform(r_drop1, (bsz,))
            prompt_mask = (random_p < 2 * p)[:, None, None]
            ehs = jnp.where(prompt_mask, jnp.zeros_like(ehs), ehs)
            image_mask = 1.0 - ((random_p >= p) & (random_p < 3 * p)).astype(cond_latents.dtype)
            cond_latents = cond_latents * image_mask[:, None, None, None]

        cond = jnp.repeat(cond_latents[:, None], num_frames, axis=1)
        model_in = jnp.concatenate([inp.astype(cond.dtype), cond], axis=-1)

        added_time_ids = jnp.tile(
            jnp.asarray([[config.fps, config.motion_bucket_id, config.train_noise_aug]],
                        jnp.float32), (bsz, 1))

        pred = unet.apply(
            params, model_in, timesteps, ehs, added_time_ids,
            domain_features=batch.get("domain_features"),
            flow_features=batch.get("flow_features"),
        )
        return edm.edm_loss(pred.astype(jnp.float32), noisy, latents, sigmas)

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = jax.tree.map(lambda e, p: e * 0.9999 + p * 0.0001, ema, params)
        return TrainState(state.step + 1, params, opt_state, ema), loss

    return train_step


def init_train_state(params, optimizer, ema: bool = False) -> TrainState:
    return TrainState(jnp.zeros((), jnp.int32), params, optimizer.init(params),
                      jax.tree.map(jnp.copy, params) if ema else None)
