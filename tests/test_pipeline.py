"""End-to-end pipeline + VAE/CLIP + multi-device sharding tests (tiny configs, CPU mesh)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModelWithProjection
from lkgd_tpu.models.configs import SVDUNetConfig
from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder, TemporalVAEConfig
from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline, SVDPipelineConfig, equal_chunks

TINY_UNET = SVDUNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=32)
TINY_VAE = TemporalVAEConfig(block_out_channels=(32, 64, 64), layers_per_block=1)


def _tiny_pipe(**cfg_kw):
    return StableVideoDiffusionPipeline(
        config=SVDPipelineConfig(height=64, width=64, num_frames=4, num_inference_steps=3,
                                 decode_chunk_size=2, **cfg_kw),
        unet_config=TINY_UNET, vae_config=TINY_VAE, clip_config=CLIPVisionConfig.tiny(),
        dtype=jnp.float32)


class TestVAE:
    def test_encode_decode_shapes(self):
        vae = AutoencoderKLTemporalDecoder(TINY_VAE)
        x = jnp.ones((4, 32, 32, 3))
        params = vae.init(jax.random.PRNGKey(0), x, num_frames=2)
        z = vae.apply(params, x, method=AutoencoderKLTemporalDecoder.encode_mode)
        assert z.shape == (4, 8, 8, 4)
        rgb = vae.apply(params, z, 2, method=AutoencoderKLTemporalDecoder.decode)
        assert rgb.shape == (4, 32, 32, 3)

    def test_moments_split(self):
        vae = AutoencoderKLTemporalDecoder(TINY_VAE)
        x = jnp.ones((2, 32, 32, 3))
        params = vae.init(jax.random.PRNGKey(0), x, num_frames=1)
        m = vae.apply(params, x, method=AutoencoderKLTemporalDecoder.encode_moments)
        z = vae.apply(params, x, method=AutoencoderKLTemporalDecoder.encode_mode)
        np.testing.assert_allclose(np.asarray(m[..., :4]), np.asarray(z))


class TestCLIP:
    def test_projection_shape(self):
        cfg = CLIPVisionConfig.tiny()
        m = CLIPVisionModelWithProjection(cfg)
        x = jnp.ones((2, cfg.image_size, cfg.image_size, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, cfg.projection_dim)


class TestPipeline:
    def test_generate_and_determinism(self):
        pipe = _tiny_pipe()
        params = pipe.init_params(jax.random.PRNGKey(0))
        img = np.random.default_rng(0).uniform(size=(1, 64, 64, 3)).astype(np.float32)
        f1 = pipe(params, img, rng=jax.random.PRNGKey(7))
        f2 = pipe(params, img, rng=jax.random.PRNGKey(7))
        assert f1.shape == (1, 4, 64, 64, 3)
        np.testing.assert_array_equal(f1, f2)  # same key -> bit-identical
        f3 = pipe(params, img, rng=jax.random.PRNGKey(8))
        assert np.abs(f3 - f1).max() > 1e-4  # different key -> different sample

    def test_latent_output_and_guidance_off(self):
        pipe = _tiny_pipe(do_classifier_free_guidance=False)
        params = pipe.init_params(jax.random.PRNGKey(0))
        img = np.zeros((1, 64, 64, 3), np.float32)
        lat = pipe(params, img, output_type="latent")
        assert lat.shape == (1, 4, 16, 16, 4)

    def test_equal_chunks(self):
        assert equal_chunks(14, 8) == 7
        assert equal_chunks(25, 8) == 5
        assert equal_chunks(8, 8) == 8
        assert equal_chunks(7, 4) == 1


class TestMultiDevice:
    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import __graft_entry__

        assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
        __graft_entry__.dryrun_multichip(8)

    def test_mesh_inference_matches_unsharded(self):
        """The v5e-8 deployment path (CFG batch over 'data', frames over 'context') must
        produce the same frames as the single-device program (fp32, same params/rng)."""
        from lkgd_tpu.parallel import mesh as meshlib

        pipe = _tiny_pipe()
        params = pipe.init_params(jax.random.PRNGKey(0))
        img = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), jnp.float32)
        want = pipe(params, img, rng=jax.random.PRNGKey(7))

        mesh = meshlib.make_mesh({"data": 2, "context": 2}, jax.devices()[:4])
        sharded = StableVideoDiffusionPipeline(
            config=pipe.config, unet_config=TINY_UNET, vae_config=TINY_VAE,
            clip_config=CLIPVisionConfig.tiny(), dtype=jnp.float32, mesh=mesh)
        with jax.set_mesh(mesh):
            p = jax.device_put(params, meshlib.replicated(mesh))
            got = sharded(p, img, rng=jax.random.PRNGKey(7))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
