"""Weight porter round-trips: our params -> torch-layout state dict -> back, bit-exact,
with full coverage (strict mode). Exercises the diffusers naming rules end to end."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModelWithProjection
from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, LoraRule, SVDUNetConfig
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder, TemporalVAEConfig
from lkgd_tpu.utils import porting

TINY = SVDUNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64)


def _randomize(params, seed=0):
    rng = np.random.default_rng(seed)
    return jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), params)


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    for path, leaf in fa:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(fb[path]),
                                      err_msg=jax.tree_util.keystr(path))


class TestUNetPorting:
    @pytest.mark.slow
    def test_roundtrip_base(self):
        model = UNetSpatioTemporalCondition(TINY)
        args = (jnp.ones((2, 2, 16, 16, 8)), jnp.zeros((2,)), jnp.ones((2, 1, 64)),
                jnp.ones((2, 3)))
        params = _randomize(model.init(jax.random.PRNGKey(0), *args))
        sd = porting.export_state_dict(params)
        # torch-style names present
        assert any(k.startswith("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q")
                   for k in sd)
        assert "conv_norm_out.weight" in sd
        back = porting.port_svd_unet(sd, params)
        _assert_trees_equal(params, back)

    def test_roundtrip_lkgd_full(self):
        cfg = dataclasses.replace(
            TINY, knowledge_fusion=True,
            joint=JointAttentionConfig(post="conv", mask=(0, 1), spatial=True, temporal=True),
            lora=LoraRouter(rules=(LoraRule(pattern="*attn1.*", name="y", rank=2,
                                            streams=(0, 1)),)))
        model = UNetSpatioTemporalCondition(cfg)
        dom = jnp.ones((2, 1, 48))
        args = (jnp.ones((2, 2, 16, 16, 8)), jnp.zeros((2,)), jnp.ones((2, 1, 64)),
                jnp.ones((2, 3)))
        params = _randomize(model.init(jax.random.PRNGKey(0), *args,
                                       domain_features=dom, flow_features=dom))
        sd = porting.export_state_dict(params)
        back = porting.port_svd_unet(
            sd, params, )
        _assert_trees_equal(params, back)

    def test_strict_detects_missing_and_unused(self):
        import pytest

        model = UNetSpatioTemporalCondition(TINY)
        args = (jnp.ones((2, 2, 16, 16, 8)), jnp.zeros((2,)), jnp.ones((2, 1, 64)),
                jnp.ones((2, 3)))
        params = model.init(jax.random.PRNGKey(0), *args)
        sd = porting.export_state_dict(params)
        k = next(iter(sd))
        bad = dict(sd)
        del bad[k]
        bad["bogus.weight"] = np.zeros((3, 3), np.float32)
        with pytest.raises(ValueError, match="missing"):
            porting.port_svd_unet(bad, params)

    def test_shape_transforms(self):
        # torch Linear / Conv2d / temporal Conv3d / depthwise Conv1d all fit
        assert porting._fit_tensor(np.zeros((8, 4)), (4, 8)).shape == (4, 8)
        assert porting._fit_tensor(np.zeros((16, 8, 3, 3)), (3, 3, 8, 16)).shape == (3, 3, 8, 16)
        assert porting._fit_tensor(np.zeros((16, 8, 3, 1, 1)), (3, 1, 8, 16)).shape == (3, 1, 8, 16)
        assert porting._fit_tensor(np.zeros((256, 4, 1)), (256, 4)).shape == (256, 4)
        assert porting._fit_tensor(np.zeros((5, 7)), (6, 6)) is None


class TestVAEPorting:
    def test_roundtrip(self):
        vae = AutoencoderKLTemporalDecoder(TemporalVAEConfig(block_out_channels=(32, 64, 64),
                                                             layers_per_block=1))
        params = _randomize(vae.init(jax.random.PRNGKey(0), jnp.ones((2, 32, 32, 3)),
                                     num_frames=2))
        # export in true diffusers naming, then re-import
        sd = porting.export_state_dict(params, key_map=porting.vae_export_key_map)
        assert any(".time_mixer.mix_factor" in k for k in sd)
        assert any(k.startswith("decoder.up_blocks.0.resnets.0.") for k in sd)
        back = porting.port_temporal_vae(sd, params)
        _assert_trees_equal(params, back)


class TestCLIPPorting:
    def test_roundtrip_with_hf_names(self):
        cfg = CLIPVisionConfig.tiny()
        m = CLIPVisionModelWithProjection(cfg)
        params = _randomize(m.init(jax.random.PRNGKey(0),
                                   jnp.ones((1, cfg.image_size, cfg.image_size, 3))))
        # export in transformers naming, then re-import
        hf = porting.export_state_dict(params, key_map=porting.clip_export_key_map)
        assert any(k.startswith("vision_model.encoder.layers.0.self_attn.") for k in hf)
        assert "vision_model.embeddings.class_embedding" in hf
        back = porting.port_clip_vision(hf, params)
        _assert_trees_equal(params, back)


class TestCogVideoXPorting:
    def test_roundtrip(self):
        from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D

        model = CogVideoXTransformer3D(CogVideoXConfig.tiny())
        dom = jnp.ones((1, 1, 48))
        params = _randomize(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 3, 4, 4, 8)), jnp.ones((1, 8, 64)),
            jnp.zeros((1,)), domain_features=dom, flow_features=dom))

        # export in true diffusers naming (+ quaternion_lora_ fusion), then re-import
        sd = porting.export_state_dict(params, key_map=porting.cogvideox_export_key_map)
        assert any(k.startswith("quaternion_lora_") for k in sd)
        assert any(".ff.net.0.proj." in k for k in sd)
        back = porting.port_cogvideox(sd, params)
        _assert_trees_equal(params, back)
