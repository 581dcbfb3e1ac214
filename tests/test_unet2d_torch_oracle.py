"""Composed-graph parity for the 2D SD UNet (the denoiser behind the 8 SD-2D
pipelines) vs a torch transcription built on the shared oracle vocabulary, plus the new
SD2 checkpoint porter round trip.

Covers: standard SD2 graph (resnets + linear-projection Transformer2D blocks), the
image-space ConditioningEmbedding add at conv_in (reference
unet_2d_condition_cond.py:70-118), and the joint x<->y variant with add_norm AdaLN +
conv_fuse post — the configuration the 2D joint trainers use
(`--post_joint conv_fuse`; reference patch.py:163-169,488-494). Also exercises
port_unet_2d / unet2d_export_key_map (our flat 2D module names need their own
diffusers-naming maps — previously SD2 checkpoints could not port at all)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from lkgd_tpu.models.configs import JointAttentionConfig
from lkgd_tpu.models.unet_2d import UNet2DCondition, UNet2DConfig
from lkgd_tpu.utils.porting import (export_state_dict, port_unet_2d,
                                    unet2d_export_key_map)

from tests.torch_svd_unet_oracle import (ParamStore, basic_transformer_block, conv2d,
                                         group_norm, resnet_block_2d,
                                         sinusoidal_embedding, timestep_embedding_mlp)

TINY = dict(block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=32)
B, H, W = 2, 16, 16


def transformer2d(p, prefix, x, ehs, heads, n_layers, joint, joint_scale, temb):
    b, c, hh, ww = x.shape
    residual = x
    h = group_norm(p, f"{prefix}.norm", x, eps=1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    from tests.torch_svd_unet_oracle import linear

    h = linear(p, f"{prefix}.proj_in", h)
    for i in range(n_layers):
        h = basic_transformer_block(p, f"{prefix}.transformer_blocks.{i}", h, ehs,
                                    heads, joint, {}, 1, joint_scale, temb=temb)
    h = linear(p, f"{prefix}.proj_out", h)
    return h.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + residual


def unet2d_forward(p, cfg, sample, timestep, ehs, cond_image=None, joint=None,
                   joint_scale=1.0):
    channels = list(cfg["block_out_channels"])
    heads = list(cfg["num_attention_heads"])
    lp = cfg["layers_per_block"]
    b = sample.shape[0]

    t_emb = sinusoidal_embedding(timestep.expand(b), channels[0])
    emb = timestep_embedding_mlp(p, "time_embedding", t_emb)

    h = conv2d(p, "conv_in", sample)
    if cond_image is not None:
        ce = "cond_embedding"
        c = F.silu(conv2d(p, f"{ce}.conv_in", cond_image))
        for i in range(len(cfg["cond_blocks"]) - 1):
            c = F.silu(conv2d(p, f"{ce}.blocks.{2 * i}", c))
            c = F.silu(conv2d(p, f"{ce}.blocks.{2 * i + 1}", c, stride=2))
        h = h + conv2d(p, f"{ce}.conv_out", c)

    res = [h]
    for i, bt in enumerate(cfg["down_block_types"]):
        for j in range(lp):
            h = resnet_block_2d(p, f"down_blocks.{i}.resnets.{j}", h, emb)
            if bt == "CrossAttnDownBlock2D":
                h = transformer2d(p, f"down_blocks.{i}.attentions.{j}", h, ehs,
                                  heads[i], 1, joint, joint_scale, emb)
            res.append(h)
        if i < len(channels) - 1:
            h = conv2d(p, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2)
            res.append(h)

    h = resnet_block_2d(p, "mid_block.resnets.0", h, emb)
    h = transformer2d(p, "mid_block.attentions.0", h, ehs, heads[-1], 1, joint,
                      joint_scale, emb)
    h = resnet_block_2d(p, "mid_block.resnets.1", h, emb)

    rev_heads = heads[::-1]
    for i, bt in enumerate(cfg["up_block_types"]):
        for j in range(lp + 1):
            skip = res.pop()
            h = torch.cat([h, skip], dim=1)
            h = resnet_block_2d(p, f"up_blocks.{i}.resnets.{j}", h, emb)
            if bt == "CrossAttnUpBlock2D":
                h = transformer2d(p, f"up_blocks.{i}.attentions.{j}", h, ehs,
                                  rev_heads[i], 1, joint, joint_scale, emb)
        if i < len(channels) - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = conv2d(p, f"up_blocks.{i}.upsamplers.0.conv", h)

    h = F.silu(group_norm(p, "conv_norm_out", h))
    return conv2d(p, "conv_out", h)


def _rand(params, seed=9):
    leaves, treedef = jax.tree.flatten(params)
    r = np.random.default_rng(seed)
    return jax.tree.unflatten(treedef, [
        jnp.asarray(r.normal(size=np.shape(l), scale=0.15), jnp.float32)
        for l in leaves])


def _run(cfg, with_cond=False, joint=None, joint_scale=1.0):
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    sample = rng.standard_normal((B, H, W, cfg.in_channels)).astype(np.float32)
    ehs = rng.standard_normal((B, 2, cfg.cross_attention_dim)).astype(np.float32)
    timestep = np.full((B,), 500.0, np.float32)
    kw = {}
    okw = {}
    if with_cond:
        cond = rng.standard_normal((B, H * 8, W * 8, 3)).astype(np.float32)
        kw["cond_image"] = cond
        okw["cond_image"] = torch.from_numpy(cond.transpose(0, 3, 1, 2)).contiguous()
    if joint is not None:
        kw["joint_scale"] = joint_scale
        okw.update(joint=joint, joint_scale=joint_scale)

    params = _rand(model.init(jax.random.PRNGKey(0), sample, timestep, ehs, **{
        k: v for k, v in kw.items() if k == "cond_image"}))
    got = np.asarray(model.apply(params, sample, timestep, ehs, **kw))

    store = ParamStore(export_state_dict(params, key_map=unet2d_export_key_map))
    ocfg = dict(block_out_channels=cfg.block_out_channels,
                down_block_types=cfg.down_block_types, up_block_types=cfg.up_block_types,
                layers_per_block=cfg.layers_per_block,
                num_attention_heads=cfg.num_attention_heads,
                cond_blocks=cfg.cond_embedding_blocks)
    want = unet2d_forward(store, ocfg,
                          torch.from_numpy(sample.transpose(0, 3, 1, 2)).contiguous(),
                          torch.from_numpy(timestep), torch.from_numpy(ehs), **okw)
    assert store.unused() == [], store.unused()[:8]
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1), rtol=1e-4,
                               atol=1e-5)
    return params


class TestComposedUNet2DParity:
    def test_base_sd2(self):
        params = _run(UNet2DConfig(**TINY))
        # porter round trip: exported diffusers-named dict imports back bit-exactly
        sd = export_state_dict(params, key_map=unet2d_export_key_map)
        template = jax.tree.map(lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.float32),
                                params)
        back = port_unet_2d(sd, template, strict=True)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_cond_embedding(self):
        """Image-space conditioning encoder added at conv_in (inpaint-cond variant)."""
        _run(UNet2DConfig(**TINY, cond_embedding_channels=32,
                          cond_embedding_blocks=(8, 8, 16, 16)), with_cond=True)

    def test_joint_add_norm_conv_fuse(self):
        """The 2D joint-trainer configuration: AdaLN-conditioned joint input + cross-
        stream conv_fuse post (reference --post_joint conv_fuse, patch.py:163-169)."""
        cfg = UNet2DConfig(**TINY, joint=JointAttentionConfig(
            post="conv_fuse", add_norm=True, mask=(0, 1), spatial=True))
        _run(cfg, joint=dict(post="conv_fuse", add_norm=True, mask=(0, 1),
                             spatial=True, temporal=False), joint_scale=0.9)
