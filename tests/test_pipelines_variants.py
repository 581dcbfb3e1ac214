"""Trans / smooth / controlnet / flow pipeline variants — tiny end-to-end runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lkgd_tpu.models.clip_vision import CLIPVisionConfig
from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, LoraRule, SVDUNetConfig
from lkgd_tpu.models.vae_temporal import TemporalVAEConfig
from lkgd_tpu.pipelines.svd import SVDPipelineConfig
from lkgd_tpu.pipelines.svd_controlnet import StableVideoDiffusionControlNetPipeline
from lkgd_tpu.pipelines.svd_flow import (
    StableVideoDiffusionFlowPipeline, StableVideoDiffusionJointVFPipeline)
from lkgd_tpu.pipelines.svd_smooth import StableVideoDiffusionSmoothPipeline
from lkgd_tpu.pipelines.svd_trans import StableVideoDiffusionTransPipeline

JOINT_UNET = SVDUNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=32,
    joint=JointAttentionConfig(post="conv", flip=True, mask=(0, 1, 0, 1), spatial=True,
                               temporal=True),
    lora=LoraRouter(rules=(
        LoraRule(pattern="*attn1n*", name="yx", rank=2, streams=(0, 1, 0, 1)),
        LoraRule(pattern="*temporal*attn1.*", name="xy", rank=2, streams=(1, 0, 1, 0)),
    )))
PLAIN_UNET = SVDUNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=32)
KW = dict(vae_config=TemporalVAEConfig(block_out_channels=(32, 64, 64), layers_per_block=1),
          clip_config=CLIPVisionConfig.tiny(), dtype=jnp.float32)
PCFG = SVDPipelineConfig(height=64, width=64, num_frames=4, num_inference_steps=2,
                         decode_chunk_size=2)

rng_img = np.random.default_rng(0)


@pytest.mark.slow
def test_trans_pipeline():
    pipe = StableVideoDiffusionTransPipeline(config=PCFG, unet_config=JOINT_UNET, **KW)
    params = pipe.init_params(jax.random.PRNGKey(0))
    s = rng_img.uniform(size=(64, 64, 3)).astype(np.float32)
    e = rng_img.uniform(size=(64, 64, 3)).astype(np.float32)
    frames = pipe(params, s, e)
    assert frames.shape == (2, 4, 64, 64, 3)
    assert np.isfinite(frames).all()


def test_smooth_pipeline():
    cfg = SVDPipelineConfig(height=64, width=64, num_frames=4, num_inference_steps=4,
                            decode_chunk_size=2)
    pipe = StableVideoDiffusionSmoothPipeline(config=cfg, unet_config=JOINT_UNET,
                                              start_step=1, total_frames=10, **KW)
    params = pipe.init_params(jax.random.PRNGKey(0))
    video = rng_img.uniform(size=(10, 64, 64, 3)).astype(np.float32)
    out = pipe(params, video)
    assert out.shape == (1, 10, 64, 64, 3)
    assert np.isfinite(out).all()


def test_controlnet_pipeline_and_reverse():
    from lkgd_tpu.models.controlnet_svd import ControlNetSDVConfig

    # tiny VAE downsamples by 4 -> embedder needs 2 stride-2 convs (3 channel entries)
    cn_cfg = ControlNetSDVConfig(unet=PLAIN_UNET,
                                 conditioning_embedding_out_channels=(16, 32, 96))
    pipe = StableVideoDiffusionControlNetPipeline(config=PCFG, unet_config=PLAIN_UNET,
                                                  controlnet_config=cn_cfg, **KW)
    params = pipe.init_params(jax.random.PRNGKey(0))
    img = rng_img.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    ctrl = rng_img.uniform(size=(4, 64, 64, 3)).astype(np.float32)
    out = pipe(params, img, control=ctrl)
    assert out.shape == (1, 4, 64, 64, 3)

    # zero-init controlnet heads: control input must not change the output at init
    out_nc = pipe(params, img)
    np.testing.assert_allclose(out, out_nc, atol=1e-5)

    rev = StableVideoDiffusionControlNetPipeline(config=PCFG, unet_config=PLAIN_UNET,
                                                 controlnet_config=cn_cfg,
                                                 reverse_time=True, **KW)
    out_r = rev(params, img, control=ctrl)
    assert out_r.shape == (1, 4, 64, 64, 3)


def test_flow_pipelines():
    pipe = StableVideoDiffusionFlowPipeline(config=PCFG, unet_config=PLAIN_UNET, **KW)
    params = pipe.init_params(jax.random.PRNGKey(0))
    img = rng_img.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    flow_img = rng_img.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    out = pipe(params, img, flow_cond=flow_img)
    assert out.shape == (1, 4, 64, 64, 3)

    import dataclasses
    fix_unet = dataclasses.replace(PLAIN_UNET, in_channels=12, dual_cond_conv_in=True)
    pipe_fix = StableVideoDiffusionFlowPipeline(config=PCFG, unet_config=fix_unet,
                                                mode="flow_fix", **KW)
    params_fix = pipe_fix.init_params(jax.random.PRNGKey(0))
    out_fix = pipe_fix(params_fix, img, flow_cond=flow_img)
    assert out_fix.shape == (1, 4, 64, 64, 3)


def test_joint_vf_pipeline():
    pipe = StableVideoDiffusionJointVFPipeline(config=PCFG, unet_config=JOINT_UNET, **KW)
    params = pipe.init_params(jax.random.PRNGKey(0))
    img = rng_img.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    frames, flows = pipe(params, img)
    assert frames.shape == (1, 4, 64, 64, 3)
    assert flows.shape == (1, 4, 64, 64, 3)


def test_flow_codec_roundtrip():
    from lkgd_tpu.utils.flow_codec import (
        flow_latent_normalize, flow_latent_unnormalize, flow_to_image_naive,
        image_to_flow_naive, flow_expand_polar, flow_squeeze_polar)
    x = jnp.asarray(rng_img.normal(size=(2, 3, 4, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(flow_latent_unnormalize(flow_latent_normalize(x))), np.asarray(x),
        rtol=1e-5, atol=1e-5)
    flow = jnp.asarray(rng_img.uniform(-20, 20, size=(4, 4, 2)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(image_to_flow_naive(flow_to_image_naive(flow))), np.asarray(flow),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(flow_squeeze_polar(flow_expand_polar(flow))), np.asarray(flow),
        rtol=1e-4, atol=1e-4)


def test_trans_plus_controlnet():
    """trans + ControlNet combined (reference pipeline_..._trans_controlnet.py): joint
    UNet + 2-stream image batch through the ControlNet pipeline."""
    from lkgd_tpu.models.controlnet_svd import ControlNetSDVConfig

    cn_cfg = ControlNetSDVConfig(unet=JOINT_UNET,
                                 conditioning_embedding_out_channels=(16, 32, 96))
    pipe = StableVideoDiffusionControlNetPipeline(
        config=PCFG, unet_config=JOINT_UNET, controlnet_config=cn_cfg,
        controlnet_cond_scale=0.5, controlnet_scale=0.8, **KW)
    params = pipe.init_params(jax.random.PRNGKey(0))
    imgs = rng_img.uniform(size=(2, 64, 64, 3)).astype(np.float32)  # [start, end]
    ctrl = rng_img.uniform(size=(4, 64, 64, 3)).astype(np.float32)
    out = pipe(params, imgs, control=ctrl)
    assert out.shape == (2, 4, 64, 64, 3)
    assert np.isfinite(out).all()


def test_scheduler_config_json(tmp_path):
    import json

    from lkgd_tpu.schedulers.euler_discrete import config_from_diffusers_json

    cfg = {"num_train_timesteps": 1000, "beta_start": 0.00085, "beta_end": 0.012,
           "beta_schedule": "scaled_linear", "prediction_type": "v_prediction",
           "use_karras_sigmas": True, "sigma_min": 0.002, "sigma_max": 700.0,
           "timestep_spacing": "leading", "timestep_type": "continuous",
           "steps_offset": 1, "_class_name": "EulerDiscreteScheduler"}
    p = tmp_path / "scheduler_config.json"
    p.write_text(json.dumps(cfg))
    c = config_from_diffusers_json(str(p))
    assert c.sigma_max == 700.0 and c.prediction_type == "v_prediction"


def test_trans_sequential_cfg_matches_batched():
    """sequential_cfg (lax.map over CFG halves + halved stream masks) must reproduce the
    batch-doubled program exactly (same params, same math, different schedule)."""
    import dataclasses

    pipe_b = StableVideoDiffusionTransPipeline(config=PCFG, unet_config=JOINT_UNET, **KW)
    pipe_s = StableVideoDiffusionTransPipeline(
        config=dataclasses.replace(PCFG, sequential_cfg=True), unet_config=JOINT_UNET, **KW)
    params = pipe_b.init_params(jax.random.PRNGKey(0))
    s = np.random.default_rng(7).uniform(size=(64, 64, 3)).astype(np.float32)
    e = np.random.default_rng(8).uniform(size=(64, 64, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(3)
    lat_b = pipe_b(params, s, e, rng=rng, output_type="latent")
    lat_s = pipe_s(params, s, e, rng=rng, output_type="latent")
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_b), rtol=2e-4, atol=2e-4)


def test_base_sequential_cfg_matches_batched():
    import dataclasses

    from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline

    pipe_b = StableVideoDiffusionPipeline(config=PCFG, unet_config=PLAIN_UNET, **KW)
    pipe_s = StableVideoDiffusionPipeline(
        config=dataclasses.replace(PCFG, sequential_cfg=True), unet_config=PLAIN_UNET, **KW)
    params = pipe_b.init_params(jax.random.PRNGKey(0))
    img = np.random.default_rng(9).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(4)
    lat_b = pipe_b(params, img, rng=rng, output_type="latent")
    lat_s = pipe_s(params, img, rng=rng, output_type="latent")
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_b), rtol=2e-4, atol=2e-4)


def test_smooth_sequential_cfg_matches_batched():
    import dataclasses

    cfg = SVDPipelineConfig(height=64, width=64, num_frames=4, num_inference_steps=4,
                            decode_chunk_size=2)
    kw = dict(unet_config=JOINT_UNET, start_step=1, total_frames=10, **KW)
    pipe_b = StableVideoDiffusionSmoothPipeline(config=cfg, **kw)
    pipe_s = StableVideoDiffusionSmoothPipeline(
        config=dataclasses.replace(cfg, sequential_cfg=True), **kw)
    params = pipe_b.init_params(jax.random.PRNGKey(0))
    video = np.random.default_rng(11).uniform(size=(10, 64, 64, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(5)
    lat_b = pipe_b(params, video, rng=rng, output_type="latent")
    lat_s = pipe_s(params, video, rng=rng, output_type="latent")
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_b), rtol=2e-4, atol=2e-4)


def test_controlnet_sequential_cfg_matches_batched():
    import dataclasses

    from lkgd_tpu.models.controlnet_svd import ControlNetSDVConfig

    cn_cfg = ControlNetSDVConfig(unet=PLAIN_UNET,
                                 conditioning_embedding_out_channels=(16, 32, 96))
    kw = dict(unet_config=PLAIN_UNET, controlnet_config=cn_cfg, **KW)
    pipe_b = StableVideoDiffusionControlNetPipeline(config=PCFG, **kw)
    pipe_s = StableVideoDiffusionControlNetPipeline(
        config=dataclasses.replace(PCFG, sequential_cfg=True), **kw)
    params = pipe_b.init_params(jax.random.PRNGKey(0))
    img = np.random.default_rng(12).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    ctrl = np.random.default_rng(13).uniform(size=(4, 64, 64, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(6)
    lat_b = pipe_b(params, img, control=ctrl, rng=rng, output_type="latent")
    lat_s = pipe_s(params, img, control=ctrl, rng=rng, output_type="latent")
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_b), rtol=2e-4, atol=2e-4)


def test_smooth_generate_accepts_oracle_noise_hooks():
    """The base-class generate() threads noise_aug/initial_noise (the verify_parity
    deterministic-noise hooks, added r4) into _generate — smooth's override must accept
    them (regression: the 3-arg signature broke pipe.generate() and the smooth bench),
    and passing the same noise explicitly must reproduce the internal draw exactly."""
    import numpy as np

    cfg = SVDPipelineConfig(height=64, width=64, num_frames=4, num_inference_steps=4,
                            decode_chunk_size=2)
    pipe = StableVideoDiffusionSmoothPipeline(config=cfg, unet_config=JOINT_UNET,
                                              start_step=1, total_frames=10, **KW)
    params = pipe.init_params(jax.random.PRNGKey(0))
    video = jnp.asarray(
        np.random.default_rng(0).uniform(size=(pipe.total_frames, 64, 64, 3)),
        jnp.float32)
    rng = jax.random.PRNGKey(1)
    out = pipe.generate(params, video, rng)  # the previously-broken entry
    assert np.isfinite(np.asarray(out)).all()
    # explicit hooks: drawing the same normals outside reproduces the default run
    rng_aug, rng_noise, _ = jax.random.split(rng, 3)
    noise_aug = jax.random.normal(rng_aug, (pipe.total_frames, 64, 64, 3), jnp.float32)
    lat_shape = (1, pipe.total_frames, pipe.latent_height, pipe.latent_width, 4)
    init_noise = jax.random.normal(rng_noise, lat_shape, jnp.float32)
    lat_default = pipe._generate(params, video, rng)
    lat_explicit = pipe._generate(params, video, rng, noise_aug, init_noise)
    # same math, different compiled programs (noise as arg vs internal draw) ->
    # fp-reassociation-level tolerance, not bit equality
    np.testing.assert_allclose(np.asarray(lat_default), np.asarray(lat_explicit),
                               rtol=5e-4, atol=5e-4)
