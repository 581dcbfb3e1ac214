"""SD 2D stack: UNet2D variants, VAE, CLIP text, ControlNet2D, inpaint + joint pipelines."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, LoraRule
from lkgd_tpu.models.controlnet_2d import ControlNet2D, ControlNet2DConfig
from lkgd_tpu.models.unet_2d import UNet2DConfig, UNet2DCondition
from lkgd_tpu.models.vae_2d import VAE2DConfig, AutoencoderKL
from lkgd_tpu.pipelines.sd2d import (
    SD2DPipelineConfig, StableDiffusionConditionPipeline, StableDiffusionInpaintPipeline,
    StableDiffusionJointControlPipeline)

TINY_UNET = UNet2DConfig(
    in_channels=4, block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=32)
TINY_VAE = VAE2DConfig(block_out_channels=(32, 64, 64), layers_per_block=1)


class TestUNet2D:
    def test_shapes_and_per_sample_timesteps(self):
        m = UNet2DCondition(TINY_UNET)
        x = jnp.ones((2, 16, 16, 4))
        ehs = jnp.ones((2, 4, 32))
        params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), ehs)
        out = m.apply(params, x, jnp.array([0.0, 500.0]), ehs)
        assert out.shape == (2, 16, 16, 4)
        # per-sample timesteps actually differ per row
        out2 = m.apply(params, x, jnp.array([500.0, 500.0]), ehs)
        assert np.abs(np.asarray(out[0] - out2[0])).max() > 1e-5
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]), atol=1e-6)

    @pytest.mark.slow
    def test_inpaint_channels_and_cond_embedding(self):
        cfg = dataclasses.replace(TINY_UNET, in_channels=9, cond_embedding_channels=3)
        m = UNet2DCondition(cfg)
        x = jnp.ones((1, 16, 16, 9))
        ehs = jnp.ones((1, 4, 32))
        cond = jnp.ones((1, 128, 128, 3))  # image space, 3 downsamples -> 16x16
        params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ehs, cond_image=cond)
        out = m.apply(params, x, jnp.zeros((1,)), ehs, cond_image=cond)
        assert out.shape == (1, 16, 16, 4)
        # zero-init cond embedding output: inert at init
        out_nc = m.apply(params, x, jnp.zeros((1,)), ehs, cond_image=cond * 5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_nc), atol=1e-6)

    def test_joint_lora_variant(self):
        cfg = dataclasses.replace(
            TINY_UNET,
            joint=JointAttentionConfig(post="conv_fuse", mask=(0, 1, 0, 1), spatial=True),
            lora=LoraRouter(rules=(LoraRule(pattern="*attn1*", name="xy", rank=2,
                                            streams=(1, 0, 1, 0)),)))
        m = UNet2DCondition(cfg)
        x = jnp.ones((4, 16, 16, 4))
        ehs = jnp.ones((4, 4, 32))
        params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((4,)), ehs)
        out = m.apply(params, x, jnp.zeros((4,)), ehs)
        assert out.shape == (4, 16, 16, 4)


class TestVAE2DAndCLIP:
    def test_vae_roundtrip(self):
        vae = AutoencoderKL(TINY_VAE)
        x = jnp.ones((1, 32, 32, 3))
        params = vae.init(jax.random.PRNGKey(0), x)
        z = vae.apply(params, x, method=AutoencoderKL.encode_mode)
        assert z.shape == (1, 8, 8, 4)
        y = vae.apply(params, z, method=AutoencoderKL.decode)
        assert y.shape == (1, 32, 32, 3)
        zs = vae.apply(params, x, jax.random.PRNGKey(1), method=AutoencoderKL.encode_sample)
        assert zs.shape == z.shape

    def test_clip_text_penultimate(self):
        m = CLIPTextModel(CLIPTextConfig.tiny())
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, size=(2, 16)))
        params = m.init(jax.random.PRNGKey(0), ids)
        out = m.apply(params, ids)
        assert out.shape == (2, 16, 32)
        pen = m.apply(params, ids, output_hidden_state_index=-2)
        assert np.abs(np.asarray(out - pen)).max() > 1e-6  # different layer depth


class TestPipelines:
    def test_inpaint(self):
        pipe = StableDiffusionInpaintPipeline(
            config=SD2DPipelineConfig(height=32, width=32, num_inference_steps=2),
            unet_config=dataclasses.replace(TINY_UNET, in_channels=9),
            vae_config=TINY_VAE)
        params = pipe.init_params(jax.random.PRNGKey(0), ctx_len=4)
        img = np.random.default_rng(0).uniform(size=(1, 32, 32, 3)).astype(np.float32)
        mask = np.zeros((1, 32, 32, 1), np.float32)
        mask[:, 8:24, 8:24] = 1.0
        out = pipe(params, jnp.ones((1, 4, 32)), img, mask)
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(out).all()

    def test_inpaint_with_controlnet(self):
        cn_cfg = ControlNet2DConfig(unet=dataclasses.replace(TINY_UNET, in_channels=4),
                                    conditioning_embedding_out_channels=(16, 32, 96))
        pipe = StableDiffusionInpaintPipeline(
            config=SD2DPipelineConfig(height=32, width=32, num_inference_steps=2),
            unet_config=dataclasses.replace(TINY_UNET, in_channels=9),
            vae_config=TINY_VAE, controlnet_config=cn_cfg)
        params = pipe.init_params(jax.random.PRNGKey(0), ctx_len=4)
        img = np.zeros((1, 32, 32, 3), np.float32)
        mask = np.ones((1, 32, 32, 1), np.float32)
        ctrl = np.ones((1, 32, 32, 3), np.float32)
        out = pipe(params, jnp.ones((1, 4, 32)), img, mask, control=ctrl)
        assert out.shape == (1, 32, 32, 3)

    def test_latent_optimization(self):
        pipe = StableDiffusionInpaintPipeline(
            config=SD2DPipelineConfig(height=32, width=32, num_inference_steps=2),
            unet_config=dataclasses.replace(TINY_UNET, in_channels=9),
            vae_config=TINY_VAE)
        z = jnp.ones((1, 8, 8, 4))
        z_opt = pipe.optimize_latents(z, lambda x: jnp.mean(x**2), guidance_lr=0.1,
                                      num_optimizer_steps=3)
        assert float(jnp.mean(z_opt**2)) < float(jnp.mean(z**2))

    def test_condition_pipeline(self):
        pipe = StableDiffusionConditionPipeline(
            config=SD2DPipelineConfig(height=32, width=32, num_inference_steps=2),
            unet_config=dataclasses.replace(TINY_UNET, in_channels=4,
                                            cond_embedding_channels=3,
                                            # 2 stride-2 convs to match TINY_VAE's 4x scale
                                            cond_embedding_blocks=(16, 32, 96)),
            vae_config=TINY_VAE)
        params = pipe.init_params(jax.random.PRNGKey(0), ctx_len=4)
        cond = np.random.default_rng(0).uniform(size=(1, 32, 32, 3)).astype(np.float32)
        out = pipe(params, jnp.ones((1, 4, 32)), cond_image=cond)
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(out).all()
        # no-cond path also works (plain text2img)
        out_nc = pipe(params, jnp.ones((1, 4, 32)))
        assert out_nc.shape == (1, 32, 32, 3)

    def test_joint_control_clamps_condition_stream(self):
        joint_unet = dataclasses.replace(
            TINY_UNET, joint=JointAttentionConfig(post="conv", mask=(0, 1, 0, 1),
                                                  spatial=True))
        pipe = StableDiffusionJointControlPipeline(
            config=SD2DPipelineConfig(height=32, width=32, num_inference_steps=2),
            unet_config=joint_unet, vae_config=TINY_VAE, cond_x=True)
        params = pipe.init_params(jax.random.PRNGKey(0), ctx_len=4)
        cond_img = np.random.default_rng(1).uniform(size=(1, 32, 32, 3)).astype(np.float32)
        out = pipe(params, jnp.ones((1, 4, 32)), cond_img)  # one prompt per x/y pair
        assert out.shape == (2, 32, 32, 3)
        # the x (condition) stream decodes the clamped condition: close to VAE roundtrip
        rt = pipe.vae.apply(params["vae"], jnp.asarray(cond_img * 2 - 1))
        rt = np.clip(np.asarray(rt) / 2 + 0.5, 0, 1)
        assert np.abs(out[0] - rt[0]).mean() < 0.05
