"""ControlNet training, data-transform variants, validation sampler, profiling utils."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.configs import SVDUNetConfig
from lkgd_tpu.models.controlnet_svd import ControlNetSDV, ControlNetSDVConfig
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
from lkgd_tpu.training.train_state import init_train_state, make_optimizer
from lkgd_tpu.training.variants import (
    consecutive_clip_batches, make_controlnet_train_step, reverse_time_batch)

TINY = SVDUNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64)


@pytest.mark.slow
def test_controlnet_training_descends_with_frozen_unet():
    unet = UNetSpatioTemporalCondition(TINY)
    cn = ControlNetSDV(ControlNetSDVConfig(
        unet=TINY, conditioning_embedding_out_channels=(16, 32, 96)), dtype=jnp.float32)
    B, T, h, w = 2, 4, 8, 8
    H, W = 32, 32  # image-space control at 4x the latent res (3-conv embedder /4)
    batch = {
        "latents": jnp.ones((B, T, h, w, 4)) * 0.1,
        "cond_latents": jnp.ones((B, h, w, 4)) * 0.2,
        "image_embeddings": jnp.ones((B, 1, 64)),
        "control": jnp.ones((B, T, H, W, 3)),
    }
    sample = jnp.zeros((B, T, h, w, 8))
    unet_params = unet.init(jax.random.PRNGKey(0), sample, jnp.zeros((B,)),
                            batch["image_embeddings"], jnp.ones((B, 3)))
    cn_params = cn.init(jax.random.PRNGKey(1), sample, jnp.zeros((B,)),
                        batch["image_embeddings"], jnp.ones((B, 3)),
                        controlnet_cond=batch["control"])
    opt = make_optimizer(1e-3)
    step = jax.jit(make_controlnet_train_step(unet, cn, opt))
    state = init_train_state(cn_params, opt, ema=True)
    batch = dict(batch, unet_params=unet_params)
    k = jax.random.PRNGKey(2)
    losses = []
    for _ in range(6):
        state, loss = step(state, batch, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # ema must track (differ from init, differ from online params)
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params,
                        state.ema_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_batch_transforms():
    lat = jnp.arange(2 * 8 * 2).reshape(2, 8, 2).astype(jnp.float32)
    rev = reverse_time_batch({"latents": lat})
    np.testing.assert_array_equal(np.asarray(rev["latents"]), np.asarray(lat[:, ::-1]))
    pairs = consecutive_clip_batches(lat, clip_len=4)
    assert pairs.shape == (4, 4, 2)
    np.testing.assert_array_equal(np.asarray(pairs[0]), np.asarray(lat[0, :4]))
    np.testing.assert_array_equal(np.asarray(pairs[2]), np.asarray(lat[0, 4:8]))


@pytest.mark.slow
def test_validation_sampler(tmp_path):
    from lkgd_tpu.models.clip_vision import CLIPVisionConfig
    from lkgd_tpu.models.vae_temporal import TemporalVAEConfig
    from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline, SVDPipelineConfig
    from lkgd_tpu.training.train_state import TrainState
    from lkgd_tpu.training.variants import make_validation_sampler

    import dataclasses

    pipe = StableVideoDiffusionPipeline(
        config=SVDPipelineConfig(height=64, width=64, num_frames=2, num_inference_steps=1,
                                 decode_chunk_size=2),
        unet_config=dataclasses.replace(TINY, cross_attention_dim=32),
        vae_config=TemporalVAEConfig(block_out_channels=(32, 64, 64), layers_per_block=1),
        clip_config=CLIPVisionConfig.tiny(), dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    state = TrainState(jnp.zeros(()), params["unet"], None, None)
    img = np.zeros((1, 64, 64, 3), np.float32)
    fn = make_validation_sampler(pipe, params, [img], str(tmp_path))
    out = fn(state, step=7)
    assert out["num_samples"] == 1
    assert os.path.exists(str(tmp_path / "step7_sample0.gif"))


def test_profiling_utils():
    from lkgd_tpu.utils.profiling import StepTimer, device_memory_stats, trace

    t = StepTimer(window=4)
    for _ in range(3):
        t.tick(jnp.ones(4))
    assert t.steps_per_sec() is not None and t.steps_per_sec() > 0
    device_memory_stats()  # must not raise
    with trace():
        _ = jnp.ones(8).sum()
