"""SD2D train step + joint x/y input-head UNet variant."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, LoraRule, SVDUNetConfig
from lkgd_tpu.models.unet_2d import UNet2DConfig, UNet2DCondition
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
from lkgd_tpu.training.sd2d import SD2DTrainConfig, make_sd2d_train_step
from lkgd_tpu.training.train_state import init_train_state, make_optimizer

TINY_2D = UNet2DConfig(
    in_channels=4, block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=32,
    joint=JointAttentionConfig(post="conv", mask=(0, 1), spatial=True),
    lora=LoraRouter(rules=(LoraRule("*attn1*", "j", 2, 2.0),)))


def test_sd2d_joint_train_step_descends():
    unet = UNet2DCondition(TINY_2D)
    B = 4  # 2 xy pairs
    batch = {"latents": jnp.ones((B, 16, 16, 4)) * 0.1,
             "prompt_embeds": jnp.ones((B, 4, 32))}
    params = unet.init(jax.random.PRNGKey(0), batch["latents"], jnp.zeros((B,)),
                       batch["prompt_embeds"])
    opt = make_optimizer(1e-3, trainable_predicate=lambda p: "lora" in p or "joint" in p)
    step = jax.jit(make_sd2d_train_step(
        unet, opt, config=SD2DTrainConfig(snr_gamma=5.0, joint_streams=True)))
    state = init_train_state(params, opt)
    k = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, loss = step(state, batch, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_svd_dual_input_head_routes_by_stream():
    cfg = SVDUNetConfig(
        block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
        up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
        layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64,
        y_input_head_mask=(0, 1))
    m = UNetSpatioTemporalCondition(cfg)
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.normal(size=(2, 2, 16, 16, 8)).astype(np.float32))
    args = (sample, jnp.zeros((2,)), jnp.ones((2, 1, 64)), jnp.ones((2, 3)))
    params = m.init(jax.random.PRNGKey(0), *args)
    out0 = m.apply(params, *args)
    # perturbing the Y head's conv must change ONLY stream 1
    params2 = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.1 if "conv_in_y" in jax.tree_util.keystr(p) else v, params)
    out1 = m.apply(params2, *args)
    assert float(jnp.abs(out1[1] - out0[1]).max()) > 1e-4
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out0[0]), atol=1e-6)
    # and the X head only stream 0
    params3 = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.1 if "time_embedding_y" in jax.tree_util.keystr(p) else v, params)
    out2 = m.apply(params3, *args)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out0[0]), atol=1e-6)
    assert float(jnp.abs(out2[1] - out0[1]).max()) > 1e-5
