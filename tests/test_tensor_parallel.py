"""Tensor-parallel / FSDP param sharding: sharded-weights inference must match
replicated inference, and each device must hold a real fraction of the weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.cogvideox import CogVideoXConfig
from lkgd_tpu.parallel.mesh import make_mesh, replicated
from lkgd_tpu.parallel.tp import (cogvideox_tp_specs, fsdp_specs,
                                  per_device_param_bytes, shard_params)
from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                              CogVideoXPipelineConfig)

import dataclasses
TCFG = dataclasses.replace(CogVideoXConfig.tiny(), num_attention_heads=4)  # head count divisible by model=4
PCFG = CogVideoXPipelineConfig(height=32, width=32, num_frames=9, num_inference_steps=2)


def _ref_and_params():
    pipe0 = CogVideoXImageToVideoPipeline(PCFG, TCFG, dtype=jnp.float32)
    params = pipe0.init_params(jax.random.PRNGKey(0))
    prompt, img = jnp.ones((1, 8, 64)), jnp.ones((1, 4, 4, 4))
    ref = pipe0(params, prompt, img)
    return params, prompt, img, ref


def test_cogvideox_tp_matches_replicated():
    params, prompt, img, ref = _ref_and_params()
    mesh = make_mesh({"model": 4}, jax.devices()[:4])
    specs = cogvideox_tp_specs(params)
    sharded = shard_params(mesh, params, specs)

    # megatron sharding really splits the attention/ff kernels
    blk = sharded["transformer"]["params"]["transformer_blocks_0"]
    q = blk["attn1"]["to_q"]["kernel"]
    assert q.addressable_shards[0].data.shape[1] * 4 == q.shape[1]
    f2 = blk["ff_2"]["kernel"]
    assert f2.addressable_shards[0].data.shape[0] * 4 == f2.shape[0]
    assert per_device_param_bytes(sharded) < 0.8 * per_device_param_bytes(
        jax.device_put(params, replicated(mesh)))

    pipe = CogVideoXImageToVideoPipeline(PCFG, TCFG, dtype=jnp.float32, mesh=mesh)
    with jax.set_mesh(mesh):
        out = pipe(sharded, prompt, img)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_cogvideox_fsdp_matches_replicated():
    params, prompt, img, ref = _ref_and_params()
    mesh = make_mesh({"model": 8})
    specs = fsdp_specs(params, axis_size=8, min_size=1)  # shard everything shardable
    sharded = shard_params(mesh, params, specs)
    n_sharded = sum(1 for leaf in jax.tree.leaves(sharded)
                    if leaf.addressable_shards[0].data.size < leaf.size)
    assert n_sharded > 20, n_sharded

    pipe = CogVideoXImageToVideoPipeline(PCFG, TCFG, dtype=jnp.float32, mesh=mesh)
    with jax.set_mesh(mesh):
        out = pipe(sharded, prompt, img)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_svd_fsdp_matches_replicated():
    """SVD pipeline with FSDP-sharded weights (the CLI --model-parallel path) must match
    replicated-weight inference bit-for-bit at fp32 tolerance."""
    from lkgd_tpu.models.clip_vision import CLIPVisionConfig
    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.vae_temporal import TemporalVAEConfig
    from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline, SVDPipelineConfig

    unet_cfg = SVDUNetConfig(
        block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
        up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
        layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=32)
    kw = dict(config=SVDPipelineConfig(height=64, width=64, num_frames=4,
                                       num_inference_steps=2, decode_chunk_size=2),
              unet_config=unet_cfg,
              vae_config=TemporalVAEConfig(block_out_channels=(32, 64, 64),
                                           layers_per_block=1),
              clip_config=CLIPVisionConfig.tiny(), dtype=jnp.float32)
    pipe0 = StableVideoDiffusionPipeline(**kw)
    params = pipe0.init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), jnp.float32)
    ref = pipe0(params, img, rng=jax.random.PRNGKey(7))

    mesh = make_mesh({"model": 8})
    sharded = shard_params(mesh, params, fsdp_specs(params, axis_size=8, min_size=1))
    n_sharded = sum(1 for leaf in jax.tree.leaves(sharded)
                    if leaf.addressable_shards[0].data.size < leaf.size)
    assert n_sharded > 50, n_sharded
    pipe = StableVideoDiffusionPipeline(**kw, mesh=mesh)
    with jax.set_mesh(mesh):
        out = pipe(sharded, img, rng=jax.random.PRNGKey(7))
    # fp32 reduction-order noise from GSPMD all-gathers: observed max |err| 2.7e-5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_tp_composes_with_context_parallel():
    """model x context 2D mesh: weights sharded over 'model', frames over 'context'."""
    params, prompt, img, ref = _ref_and_params()
    mesh = make_mesh({"context": 2, "model": 4})
    sharded = shard_params(mesh, params, cogvideox_tp_specs(params))
    pipe = CogVideoXImageToVideoPipeline(PCFG, TCFG, dtype=jnp.float32, mesh=mesh)
    with jax.set_mesh(mesh):
        out = pipe(sharded, prompt, img)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_3d_parallel_tp_sp_dp_compose():
    """One 8-device mesh running ALL THREE at once: CFG batch over 'data', Ulysses
    sequence-parallel attention over 'context', megatron TP weights over 'model' —
    output must match the plain single-program pipeline."""
    import dataclasses as dc

    mesh = make_mesh({"data": 2, "context": 2, "model": 2})
    tcfg = dc.replace(CogVideoXConfig.tiny(), num_attention_heads=4,
                      sequence_parallel="ulysses")
    ref_cfg = dc.replace(CogVideoXConfig.tiny(), num_attention_heads=4)
    pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=25,
                                   num_inference_steps=2)

    pipe0 = CogVideoXImageToVideoPipeline(pcfg, ref_cfg, dtype=jnp.float32)
    params = pipe0.init_params(jax.random.PRNGKey(0))
    prompt, img = jnp.ones((1, 8, 64)), jnp.ones((1, 4, 4, 4))
    ref = pipe0(params, prompt, img)

    sharded = shard_params(mesh, params, cogvideox_tp_specs(params))
    pipe = CogVideoXImageToVideoPipeline(pcfg, tcfg, dtype=jnp.float32, mesh=mesh)
    with jax.set_mesh(mesh):
        out = pipe(sharded, prompt, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
