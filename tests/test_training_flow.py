"""Flow-video training prep (train_svd_of*) + joint-stream sigma tying."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.unimatch import UniMatch, UniMatchConfig
from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder, TemporalVAEConfig
from lkgd_tpu.training.flow import make_flow_batch_fn, make_joint_vf_batch
from lkgd_tpu.utils.optical_flow import make_flow_fn

TINY_VAE = TemporalVAEConfig(block_out_channels=(32, 64, 64), layers_per_block=1)


def _flow_fn_and_vae(h, w):
    um = UniMatch(UniMatchConfig.tiny())
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    up = um.init(jax.random.PRNGKey(0), jnp.zeros((1, ph, pw, 3)),
                 jnp.zeros((1, ph, pw, 3)))
    vae = AutoencoderKLTemporalDecoder(TINY_VAE)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)), num_frames=1)
    return make_flow_fn(um, up, (h, w)), vae, vp


class TestFlowBatchPrep:
    @pytest.mark.slow
    def test_of_mode_shapes_and_normalization(self):
        h = w = 32
        flow_fn, vae, vp = _flow_fn_and_vae(h, w)
        prep = make_flow_batch_fn(flow_fn, vae, mode="of")
        frames = jnp.asarray(np.random.default_rng(0)
                             .uniform(-1, 1, size=(2, 5, h, w, 3)).astype(np.float32))
        emb = jnp.ones((2, 1, 64))
        batch = prep(vp, frames, emb, jax.random.PRNGKey(2))
        assert batch["latents"].shape == (2, 4, h // 4, w // 4, 4)
        assert batch["cond_latents"].shape == (2, h // 4, w // 4, 4)
        assert np.isfinite(np.asarray(batch["latents"])).all()

    def test_of_fix_mode_has_dual_cond_channels(self):
        h = w = 32
        flow_fn, vae, vp = _flow_fn_and_vae(h, w)
        prep = make_flow_batch_fn(flow_fn, vae, mode="of_fix")
        frames = jnp.asarray(np.random.default_rng(1)
                             .uniform(-1, 1, size=(1, 3, h, w, 3)).astype(np.float32))
        batch = prep(vp, frames, jnp.ones((1, 1, 64)), jax.random.PRNGKey(3))
        assert batch["cond_latents"].shape == (1, h // 4, w // 4, 8)

    def test_joint_vf_interleaving(self):
        v = jnp.arange(2 * 3 * 4 * 4 * 4, dtype=jnp.float32).reshape(2, 3, 4, 4, 4)
        f = -v
        emb = jnp.asarray([[[1.0]], [[2.0]]])
        batch = make_joint_vf_batch(v, f, emb)
        assert batch["latents"].shape == (4, 3, 4, 4, 4)
        np.testing.assert_array_equal(np.asarray(batch["latents"][0]), np.asarray(v[0]))
        np.testing.assert_array_equal(np.asarray(batch["latents"][1]), np.asarray(f[0]))
        np.testing.assert_array_equal(np.asarray(batch["latents"][2]), np.asarray(v[1]))
        np.testing.assert_array_equal(np.asarray(batch["image_embeddings"][:2]),
                                      np.asarray(jnp.tile(emb[:1], (2, 1, 1))))


class TestTiedStreamPairs:
    @pytest.mark.slow
    def test_trans_style_train_step_runs(self):
        from lkgd_tpu.models.configs import (JointAttentionConfig, LoraRouter, LoraRule,
                                             SVDUNetConfig)
        from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
        from lkgd_tpu.training.train_state import (SVDTrainConfig, init_train_state,
                                                   make_optimizer, make_svd_train_step)

        cfg = SVDUNetConfig(
            block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlockSpatioTemporal",
                              "DownBlockSpatioTemporal"),
            up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
            layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64,
            joint=JointAttentionConfig(post="conv", flip=True, mask=(0, 1)),
            lora=LoraRouter(rules=(
                LoraRule("*attn1n*", "yx_lora", 2, 2.0, (0, 1)),
                LoraRule("*attn1.*", "xy_lora", 2, 2.0, (1, 0)),
            )))
        unet = UNetSpatioTemporalCondition(cfg)
        B, T, hw = 4, 4, 8  # interleaved [x0,y0,x1,y1]
        batch = {
            "latents": jnp.ones((B, T, hw, hw, 4)) * 0.1,
            "cond_latents": jnp.ones((B, hw, hw, 4)) * 0.2,
            "image_embeddings": jnp.ones((B, 1, 64)),
        }
        trainable = lambda p: "lora" in p or "joint" in p
        opt = make_optimizer(1e-3, trainable_predicate=trainable)
        params = unet.init(jax.random.PRNGKey(0),
                           jnp.concatenate([batch["latents"]] * 2, axis=-1),
                           jnp.zeros((B,)), batch["image_embeddings"], jnp.ones((B, 3)))
        step = make_svd_train_step(unet, opt, SVDTrainConfig(
            conditioning_dropout_prob=0.0, tie_stream_pairs=True))
        state = init_train_state(params, opt)
        state, loss = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
