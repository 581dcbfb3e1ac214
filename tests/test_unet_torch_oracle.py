"""Composed-graph parity: the full Flax SVD UNet forward vs an independent torch
transcription (tests/torch_svd_unet_oracle.py) with identical weights.

This closes the evidence gap between per-op oracles (quaternion, scheduler, flash
attention) and manifests/param-counts: here the *entire denoiser graph* — embeddings,
spatio-temporal resblocks, alpha blending, spatial+temporal transformers, skip wiring,
LKGD fusion, joint attention with flips and stream-masked LoRA — must agree numerically
at fp32 through one composed forward. Weights are randomized (zero-init branches like
conv1n/LoRA-B would otherwise hide their subgraphs) and travel through
`export_state_dict`, so the exporter's name coverage is asserted too (every exported
tensor consumed exactly once by the oracle).

Reference parity targets: `/root/reference/models/unet_spatio_temporal_condition.py:448-688`,
`/root/reference/patch/patch.py:390-686`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lkgd_tpu.models.configs import (JointAttentionConfig, LoraRouter, LoraRule,
                                     SVDUNetConfig)
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
from lkgd_tpu.utils.porting import export_state_dict, svd_export_key_map

from tests.torch_svd_unet_oracle import ParamStore, unet_forward

TINY = dict(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64)

B, T, H, W = 2, 3, 8, 8  # latent-space spatial dims; T=3 makes frame flips asymmetric


def _randomize(params, seed=42, scale=0.2):
    """Replace every leaf with a random normal — zero-init params (conv1n, LoRA B,
    scale1n, AdaLN) would otherwise zero out their whole subgraph and hide wiring bugs."""
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(seed)
    new = [jnp.asarray(rng.normal(size=np.shape(l), scale=scale), jnp.float32)
           for l in leaves]
    return jax.tree.unflatten(treedef, new)


def _inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    sample = rng.standard_normal((B, T, H, W, cfg.in_channels)).astype(np.float32)
    timestep = np.full((B,), 0.25 * np.log(7.0), np.float32)
    ehs = rng.standard_normal((B, 1, cfg.cross_attention_dim)).astype(np.float32)
    add_ids = np.asarray([[6.0, 127.0, 0.02]] * B, np.float32)
    return sample, timestep, ehs, add_ids


def _compare(flax_out, torch_out):
    got = np.asarray(flax_out, np.float32)
    want = torch_out.numpy().transpose(0, 1, 3, 4, 2)  # NCHW -> NHWC frames
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _oracle_cfg(cfg):
    return dict(block_out_channels=cfg.block_out_channels,
                down_block_types=cfg.down_block_types, up_block_types=cfg.up_block_types,
                layers_per_block=cfg.layers_per_block,
                transformer_layers_per_block=cfg.transformer_layers_per_block,
                num_attention_heads=cfg.num_attention_heads,
                cross_attention_dim=cfg.cross_attention_dim)


def _run(cfg, **oracle_kw):
    unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.float32)
    sample, timestep, ehs, add_ids = _inputs(cfg)
    flax_kw = {}
    if "joint_scale" in oracle_kw:
        flax_kw["joint_scale"] = oracle_kw["joint_scale"]
    if cfg.knowledge_fusion:
        rng = np.random.default_rng(7)
        domain = rng.standard_normal((B, 1, 48)).astype(np.float32)
        flow = rng.standard_normal((B, 1, 48)).astype(np.float32)
        flax_kw = dict(domain_features=domain, flow_features=flow)
        oracle_kw = dict(oracle_kw, domain=torch.from_numpy(domain),
                         flow=torch.from_numpy(flow))
    params = _randomize(unet.init(jax.random.PRNGKey(0), sample, timestep, ehs, add_ids,
                                  **flax_kw))
    got = unet.apply(params, sample, timestep, ehs, add_ids, **flax_kw)

    store = ParamStore(export_state_dict(params, key_map=svd_export_key_map))
    want = unet_forward(
        store, _oracle_cfg(cfg),
        torch.from_numpy(sample.transpose(0, 1, 4, 2, 3)).contiguous(),
        torch.from_numpy(timestep), torch.from_numpy(ehs), torch.from_numpy(add_ids),
        **oracle_kw)
    assert store.unused() == [], f"exported but unconsumed: {store.unused()[:8]}"
    _compare(got, want)


class TestComposedUNetParity:
    def test_base(self):
        """Stock SVD UNet graph (reference unet :448-688, no LKGD additions)."""
        _run(SVDUNetConfig(**TINY))

    def test_knowledge_fusion(self):
        """Quaternion+rFFT latent-knowledge fusion composed into the denoiser
        (reference unet :536-595)."""
        _run(SVDUNetConfig(**TINY, knowledge_fusion=True))

    def test_joint_trans_with_masked_lora(self):
        """The flagship trans config: joint attention on spatial+temporal blocks with
        frame flip, plus two stream-masked LoRA adapters (one on the joint branch with
        the reference's inverted K/V masks, one on temporal attn1) — reference
        patch.py:390-686,872-896 and train_svd_trans_lora.py adapters."""
        mask, inv = (0, 1), (1, 0)
        cfg = SVDUNetConfig(
            **TINY,
            joint=JointAttentionConfig(post="conv", flip=True, mask=mask, spatial=True,
                                       temporal=True),
            lora=LoraRouter(rules=(
                LoraRule("*attn1n*", "yx_lora", 4, 4.0, mask),
                LoraRule("*temporal_transformer_blocks*attn1.*", "xy_lora", 4, 4.0, inv),
            )))
        _run(cfg,
             joint=dict(post="conv", flip=True, mask=mask, spatial=True, temporal=True),
             lora_cfg={"yx_lora": (4.0, mask), "xy_lora": (4.0, inv)},
             joint_scale=0.7)

    def test_joint_conv_fuse_post(self):
        """conv_fuse post-projection: cross-stream feature mixing through one zero-init
        linear (reference patch.py:488-494); spatial-only joint, no flip."""
        cfg = SVDUNetConfig(
            **TINY,
            joint=JointAttentionConfig(post="conv_fuse", mask=(0, 1), spatial=True))
        _run(cfg, joint=dict(post="conv_fuse", mask=(0, 1), spatial=True, temporal=False))

    def test_joint_scale_post(self):
        """scale post-projection (reference patch.py:147-149,490-492)."""
        cfg = SVDUNetConfig(
            **TINY, joint=JointAttentionConfig(post="scale", mask=(0, 1), spatial=True))
        _run(cfg, joint=dict(post="scale", mask=(0, 1), spatial=True, temporal=False),
             joint_scale=1.3)
