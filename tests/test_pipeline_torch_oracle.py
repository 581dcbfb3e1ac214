"""END-TO-END pipeline parity: the assembled JAX SVD pipeline (CLIP antialias-resize
conditioning chain -> noise-aug VAE encode -> CFG-linspace guidance -> Euler-Karras
scan -> chunked temporal decode) vs an independent plain-torch transcription of the
reference ``__call__`` (tests/torch_svd_pipeline_oracle.py) with identical exported
weights and injected fixed noise.

The per-model composed oracles (UNet/VAE/CLIP/ControlNet) cannot catch *integration*
bugs — latent scaling order, noise indexing, guidance broadcast, CFG half ordering,
conditioning concat axis — which is exactly what BASELINE.json's "denoised latents
match the PyTorch reference to fp32 tolerance" bar is about. Here the whole
``generate()`` program must agree numerically at fp32.

Reference parity target: `/root/reference/pipeline/pipeline_stable_video_diffusion_trans.py:352-656`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lkgd_tpu.models.clip_vision import CLIPVisionConfig
from lkgd_tpu.models.configs import (JointAttentionConfig, LoraRouter, LoraRule,
                                     SVDUNetConfig)
from lkgd_tpu.models.vae_temporal import TemporalVAEConfig
from lkgd_tpu.pipelines.svd import SVDPipelineConfig, StableVideoDiffusionPipeline
from lkgd_tpu.pipelines.svd_trans import StableVideoDiffusionTransPipeline
from lkgd_tpu.utils.porting import (clip_export_key_map, export_state_dict,
                                    svd_export_key_map, vae_export_key_map)

from tests.torch_svd_unet_oracle import ParamStore
from tests.torch_svd_pipeline_oracle import svd_decode_frames, svd_pipeline_generate

H = W = 48  # pipeline resolution: CLIP resize 48->32 is a real antialiased downscale
T, STEPS = 4, 3
TINY_UNET = dict(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64)
CLIP_CFG = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                            num_heads=2, intermediate_size=128, projection_dim=64)
VAE_CFG = TemporalVAEConfig(block_out_channels=(32, 64), layers_per_block=1)
PIPE_CFG = SVDPipelineConfig(height=H, width=W, num_frames=T, num_inference_steps=STEPS,
                             decode_chunk_size=2)


def _oracle_unet_cfg(cfg: SVDUNetConfig) -> dict:
    return dict(block_out_channels=cfg.block_out_channels,
                down_block_types=cfg.down_block_types, up_block_types=cfg.up_block_types,
                layers_per_block=cfg.layers_per_block,
                transformer_layers_per_block=cfg.transformer_layers_per_block,
                num_attention_heads=cfg.num_attention_heads,
                cross_attention_dim=cfg.cross_attention_dim)


def _randomize(params, seed=11, scale=0.15):
    """Random normals everywhere — zero-init branches (LoRA B, joint posts) would
    otherwise hide their subgraphs from the parity check."""
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(seed)
    return jax.tree.unflatten(treedef, [
        jnp.asarray(rng.normal(size=np.shape(l), scale=scale), jnp.float32)
        for l in leaves])


def _export(params):
    unet_store = ParamStore(export_state_dict(params["unet"], key_map=svd_export_key_map))
    vae_sd = {k: torch.tensor(v) for k, v in export_state_dict(
        params["vae"], key_map=vae_export_key_map).items()}
    clip_store = ParamStore(export_state_dict(params["image_encoder"],
                                              key_map=clip_export_key_map))
    return unet_store, vae_sd, clip_store


def _noises(batch, seed=5):
    rng = np.random.default_rng(seed)
    image = rng.uniform(size=(batch, H, W, 3)).astype(np.float32)
    noise_aug = rng.standard_normal((batch, H, W, 3)).astype(np.float32)
    init_noise = rng.standard_normal((batch, T, H // 2, W // 2, 4)).astype(np.float32)
    return image, noise_aug, init_noise


def _run_torch(pipe, params, image, noise_aug, init_noise, **oracle_kw):
    unet_store, vae_sd, clip_store = _export(params)
    want_lat = svd_pipeline_generate(
        unet_store, _oracle_unet_cfg(pipe.unet.config), vae_sd, VAE_CFG,
        clip_store, CLIP_CFG,
        torch.from_numpy(image.transpose(0, 3, 1, 2)).contiguous(),
        torch.from_numpy(noise_aug.transpose(0, 3, 1, 2)).contiguous(),
        torch.from_numpy(init_noise.transpose(0, 1, 4, 2, 3)).contiguous(),
        num_frames=T, num_inference_steps=STEPS, **oracle_kw)
    assert unet_store.unused() == [], f"unconsumed: {unet_store.unused()[:8]}"
    assert clip_store.unused() == [], f"unconsumed: {clip_store.unused()[:8]}"
    return want_lat, vae_sd


class TestPipelineEndToEndParity:
    def test_base_pipeline_latents_and_frames(self):
        """Stock img2vid path: every stage of generate() vs the reference transcription,
        including the chunked decode + [0,1] postprocess."""
        pipe = StableVideoDiffusionPipeline(config=PIPE_CFG,
                                            unet_config=SVDUNetConfig(**TINY_UNET),
                                            vae_config=VAE_CFG, clip_config=CLIP_CFG,
                                            dtype=jnp.float32)
        params = _randomize(pipe.init_params(jax.random.PRNGKey(0)))
        image, noise_aug, init_noise = _noises(batch=1)

        got_lat = np.asarray(pipe(params, image, output_type="latent",
                                  noise_aug=jnp.asarray(noise_aug),
                                  initial_noise=jnp.asarray(init_noise)), np.float32)
        want_lat, vae_sd = _run_torch(pipe, params, image, noise_aug, init_noise)
        np.testing.assert_allclose(got_lat,
                                   want_lat.numpy().transpose(0, 1, 3, 4, 2),
                                   rtol=1e-4, atol=2e-4)

        got_frames = np.asarray(pipe._decode(params["vae"], jnp.asarray(got_lat)))
        want_frames = svd_decode_frames(vae_sd, VAE_CFG, want_lat, T,
                                        decode_chunk_size=2)
        np.testing.assert_allclose(got_frames, want_frames, rtol=1e-4, atol=2e-4)

    @pytest.mark.slow
    def test_trans_joint_lora_pipeline_latents(self):
        """The flagship trans path: two coupled streams, joint attention with flip +
        inverted-mask LoRA through the FULL pipeline loop (reference trans __call__ with
        patch.set_joint_attention enabled, rows [x_u, y_u, x_c, y_c])."""
        mask, inv = (0, 1, 0, 1), (1, 0, 1, 0)
        ucfg = SVDUNetConfig(
            **TINY_UNET,
            joint=JointAttentionConfig(post="conv", flip=True, mask=mask, spatial=True,
                                       temporal=True),
            lora=LoraRouter(rules=(
                LoraRule("*attn1n*", "yx_lora", 4, 4.0, mask),
                LoraRule("*temporal_transformer_blocks*attn1.*", "xy_lora", 4, 4.0, inv),
            )))
        pipe = StableVideoDiffusionTransPipeline(
            config=PIPE_CFG, unet_config=ucfg, vae_config=VAE_CFG, clip_config=CLIP_CFG,
            dtype=jnp.float32)
        params = _randomize(pipe.init_params(jax.random.PRNGKey(1)), seed=13)
        image, noise_aug, init_noise = _noises(batch=2, seed=9)

        got_lat = np.asarray(pipe(params, image, output_type="latent",
                                  noise_aug=jnp.asarray(noise_aug),
                                  initial_noise=jnp.asarray(init_noise)), np.float32)
        want_lat, _ = _run_torch(
            pipe, params, image, noise_aug, init_noise,
            joint=dict(post="conv", flip=True, mask=mask, spatial=True, temporal=True),
            lora_cfg={"yx_lora": (4.0, mask), "xy_lora": (4.0, inv)})
        np.testing.assert_allclose(got_lat,
                                   want_lat.numpy().transpose(0, 1, 3, 4, 2),
                                   rtol=1e-4, atol=2e-4)

    @pytest.mark.slow
    def test_controlnet_pipeline_latents(self):
        """ControlNet-conditioned path through the full loop: per-frame control images ->
        cond embedder -> zero-conv residuals injected into the UNet each step (reference
        pipeline_stable_video_diffusion_controlnet.py:585-600)."""
        from lkgd_tpu.models.controlnet_svd import ControlNetSDVConfig
        from lkgd_tpu.pipelines.svd_controlnet import StableVideoDiffusionControlNetPipeline
        from tests.test_controlnet_torch_oracle import controlnet_forward

        ucfg = SVDUNetConfig(**TINY_UNET)
        ccfg = ControlNetSDVConfig(unet=ucfg,
                                   conditioning_embedding_out_channels=(8, 16))
        pipe = StableVideoDiffusionControlNetPipeline(
            config=PIPE_CFG, unet_config=ucfg, vae_config=VAE_CFG, clip_config=CLIP_CFG,
            dtype=jnp.float32, controlnet_config=ccfg, controlnet_cond_scale=0.8)
        params = _randomize(pipe.init_params(jax.random.PRNGKey(2)), seed=17)
        image, noise_aug, init_noise = _noises(batch=1, seed=23)
        rng = np.random.default_rng(29)
        control = rng.uniform(size=(1, T, H, W, 3)).astype(np.float32)

        got_lat = np.asarray(pipe(params, image, control=control, output_type="latent",
                                  noise_aug=jnp.asarray(noise_aug),
                                  initial_noise=jnp.asarray(init_noise)), np.float32)

        cstore = ParamStore(export_state_dict(params["controlnet"],
                                              key_map=svd_export_key_map))
        c_ocfg = dict(block_out_channels=ucfg.block_out_channels,
                      down_block_types=ucfg.down_block_types,
                      layers_per_block=ucfg.layers_per_block,
                      num_attention_heads=ucfg.num_attention_heads,
                      cond_channels=ccfg.conditioning_embedding_out_channels)
        t_control = torch.from_numpy(control.transpose(0, 1, 4, 2, 3)).contiguous()
        t_control = torch.cat([t_control] * 2)  # CFG rows, reference :552

        def ctl(lmi, t, emb, add_ids):
            return controlnet_forward(cstore, c_ocfg, lmi, t, emb, add_ids, t_control,
                                      scale=0.8)

        want_lat, _ = _run_torch(pipe, params, image, noise_aug, init_noise,
                                 controlnet=ctl)
        assert cstore.unused() == [], cstore.unused()[:8]
        np.testing.assert_allclose(got_lat,
                                   want_lat.numpy().transpose(0, 1, 3, 4, 2),
                                   rtol=1e-4, atol=2e-4)
