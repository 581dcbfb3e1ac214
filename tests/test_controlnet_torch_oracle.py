"""Composed-graph parity for ControlNet-SDV: the Flax controlnet + UNet-with-residuals
forward vs a torch transcription built on the SVD oracle vocabulary.

Verifies the full control path the trans/controlnet pipelines run each step: image-space
conditioning embedder (4 stride-2 convs, zero-init out — here randomized), encoder+mid
copy, zero-init 1x1 controlnet heads, conditioning_scale, and the host UNet's residual
injection points. Reference: `/root/reference/models/controlnet_sdv.py:64-638` and
unet :640-658."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from lkgd_tpu.models.configs import SVDUNetConfig
from lkgd_tpu.models.controlnet_svd import ControlNetSDV, ControlNetSDVConfig
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
from lkgd_tpu.utils.porting import export_state_dict, svd_export_key_map

from tests.torch_svd_unet_oracle import (ParamStore, conv2d, sinusoidal_embedding,
                                         spatio_temporal_res_block,
                                         timestep_embedding_mlp,
                                         transformer_spatio_temporal)

TINY = dict(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64)
B, T, H, W = 2, 3, 8, 8  # latent dims; control images are 8x upscaled


def controlnet_forward(p, cfg, sample, timestep, ehs, add_ids, control, scale):
    """Torch transcription of ControlNetSDV.__call__ (reference controlnet_sdv.py
    :441-578): UNet encoder+mid on sample (+cond embedding), zero-conv residual heads."""
    b, t = sample.shape[:2]
    channels = list(cfg["block_out_channels"])
    heads = list(cfg["num_attention_heads"])

    t_emb = sinusoidal_embedding(timestep.expand(b), channels[0])
    emb = timestep_embedding_mlp(p, "time_embedding", t_emb)
    add_embeds = sinusoidal_embedding(add_ids.reshape(-1), 256).reshape(b, -1)
    emb = emb + timestep_embedding_mlp(p, "add_embedding", add_embeds)

    sample = sample.reshape(b * t, *sample.shape[2:])
    emb = emb.repeat_interleave(t, dim=0)
    ehs = ehs.repeat_interleave(t, dim=0)
    image_only_indicator = torch.zeros(b, t)

    h = conv2d(p, "conv_in", sample)
    # conditioning embedder (reference :64-119)
    ce = "controlnet_cond_embedding"
    c = F.silu(conv2d(p, f"{ce}.conv_in", control.reshape(b * t, *control.shape[2:])))
    n_blocks = len(cfg["cond_channels"]) - 1
    for i in range(n_blocks):
        c = F.silu(conv2d(p, f"{ce}.blocks.{2 * i}", c))
        c = F.silu(conv2d(p, f"{ce}.blocks.{2 * i + 1}", c, stride=2))
    h = h + conv2d(p, f"{ce}.conv_out", c)

    res_samples = [h]
    for i, block_type in enumerate(cfg["down_block_types"]):
        for j in range(cfg["layers_per_block"]):
            h = spatio_temporal_res_block(p, f"down_blocks.{i}.resnets.{j}", h, emb,
                                          image_only_indicator)
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                h = transformer_spatio_temporal(
                    p, f"down_blocks.{i}.attentions.{j}", h, ehs, image_only_indicator,
                    heads[i], 1, None, {}, 1.0)
            res_samples.append(h)
        if i < len(channels) - 1:
            h = conv2d(p, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2)
            res_samples.append(h)

    h = spatio_temporal_res_block(p, "mid_block.resnets.0", h, emb, image_only_indicator)
    h = transformer_spatio_temporal(p, "mid_block.attentions.0", h, ehs,
                                    image_only_indicator, heads[-1], 1, None, {}, 1.0)
    h = spatio_temporal_res_block(p, "mid_block.resnets.1", h, emb, image_only_indicator)

    down = [conv2d(p, f"controlnet_down_blocks.{i}", r, padding=0) * scale
            for i, r in enumerate(res_samples)]
    mid = conv2d(p, "controlnet_mid_block", h, padding=0) * scale
    return down, mid


def test_controlnet_sdv_composed_parity():
    rng = np.random.default_rng(4)
    ucfg = SVDUNetConfig(**TINY)
    ccfg = ControlNetSDVConfig(unet=ucfg, conditioning_embedding_out_channels=(8, 8, 16, 16))
    unet = UNetSpatioTemporalCondition(ucfg, dtype=jnp.float32)
    cnet = ControlNetSDV(ccfg, dtype=jnp.float32)

    sample = rng.standard_normal((B, T, H, W, ucfg.in_channels)).astype(np.float32)
    control = rng.standard_normal((B, T, H * 8, W * 8, 3)).astype(np.float32)
    timestep = np.full((B,), 0.25 * np.log(7.0), np.float32)
    ehs = rng.standard_normal((B, 1, ucfg.cross_attention_dim)).astype(np.float32)
    add_ids = np.asarray([[6.0, 127.0, 0.02]] * B, np.float32)

    def rand(params, seed):
        leaves, treedef = jax.tree.flatten(params)
        r = np.random.default_rng(seed)
        return jax.tree.unflatten(treedef, [
            jnp.asarray(r.normal(size=np.shape(l), scale=0.15), jnp.float32)
            for l in leaves])

    uparams = rand(unet.init(jax.random.PRNGKey(0), sample, timestep, ehs, add_ids), 21)
    cparams = rand(cnet.init(jax.random.PRNGKey(1), sample, timestep, ehs, add_ids,
                             controlnet_cond=control), 22)

    scale = 0.8
    down, mid = cnet.apply(cparams, sample, timestep, ehs, add_ids,
                           controlnet_cond=control, conditioning_scale=scale)
    got = np.asarray(unet.apply(uparams, sample, timestep, ehs, add_ids,
                                down_block_additional_residuals=down,
                                mid_block_additional_residual=mid))

    cstore = ParamStore(export_state_dict(cparams, key_map=svd_export_key_map))
    ocfg = dict(block_out_channels=ucfg.block_out_channels,
                down_block_types=ucfg.down_block_types,
                layers_per_block=ucfg.layers_per_block,
                num_attention_heads=ucfg.num_attention_heads,
                cond_channels=ccfg.conditioning_embedding_out_channels)
    t_sample = torch.from_numpy(sample.transpose(0, 1, 4, 2, 3)).contiguous()
    t_control = torch.from_numpy(control.transpose(0, 1, 4, 2, 3)).contiguous()
    t_down, t_mid = controlnet_forward(
        cstore, ocfg, t_sample, torch.from_numpy(timestep), torch.from_numpy(ehs),
        torch.from_numpy(add_ids), t_control, scale)
    assert cstore.unused() == [], cstore.unused()[:8]

    # cross-check residuals themselves before composing
    for d, td in zip(down, t_down):
        np.testing.assert_allclose(np.asarray(d), td.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)

    ustore = ParamStore(export_state_dict(uparams, key_map=svd_export_key_map))
    ocfg_u = dict(block_out_channels=ucfg.block_out_channels,
                  down_block_types=ucfg.down_block_types,
                  up_block_types=ucfg.up_block_types,
                  layers_per_block=ucfg.layers_per_block,
                  num_attention_heads=ucfg.num_attention_heads,
                  cross_attention_dim=ucfg.cross_attention_dim)
    # inject the torch residuals into the torch UNet oracle forward
    want = unet_forward_with_residuals(ustore, ocfg_u, t_sample,
                                       torch.from_numpy(timestep),
                                       torch.from_numpy(ehs),
                                       torch.from_numpy(add_ids), t_down, t_mid)
    assert ustore.unused() == [], ustore.unused()[:8]
    np.testing.assert_allclose(got, want.numpy().transpose(0, 1, 3, 4, 2),
                               rtol=1e-4, atol=1e-5)


def unet_forward_with_residuals(p, cfg, sample, timestep, ehs, add_ids, down_res, mid_res):
    """The SVD UNet forward with ControlNet residual injection (reference unet
    :640-658) — transcribed here on top of the oracle primitives."""
    b, t = sample.shape[:2]
    channels = list(cfg["block_out_channels"])
    heads = list(cfg["num_attention_heads"])
    lp = cfg["layers_per_block"]

    t_emb = sinusoidal_embedding(timestep.expand(b), channels[0])
    emb = timestep_embedding_mlp(p, "time_embedding", t_emb)
    add_embeds = sinusoidal_embedding(add_ids.reshape(-1), 256).reshape(b, -1)
    emb = emb + timestep_embedding_mlp(p, "add_embedding", add_embeds)

    sample = sample.reshape(b * t, *sample.shape[2:])
    emb = emb.repeat_interleave(t, dim=0)
    ehs = ehs.repeat_interleave(t, dim=0)
    ioi = torch.zeros(b, t)

    h = conv2d(p, "conv_in", sample)
    res_samples = [h]
    for i, block_type in enumerate(cfg["down_block_types"]):
        for j in range(lp):
            h = spatio_temporal_res_block(p, f"down_blocks.{i}.resnets.{j}", h, emb, ioi)
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                h = transformer_spatio_temporal(p, f"down_blocks.{i}.attentions.{j}", h,
                                                ehs, ioi, heads[i], 1, None, {}, 1.0)
            res_samples.append(h)
        if i < len(channels) - 1:
            h = conv2d(p, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2)
            res_samples.append(h)

    res_samples = [r + a for r, a in zip(res_samples, down_res)]

    h = spatio_temporal_res_block(p, "mid_block.resnets.0", h, emb, ioi)
    h = transformer_spatio_temporal(p, "mid_block.attentions.0", h, ehs, ioi, heads[-1],
                                    1, None, {}, 1.0)
    h = spatio_temporal_res_block(p, "mid_block.resnets.1", h, emb, ioi)
    h = h + mid_res

    rev_heads = heads[::-1]
    for i, block_type in enumerate(cfg["up_block_types"]):
        for j in range(lp + 1):
            skip = res_samples.pop()
            h = torch.cat([h, skip], dim=1)
            h = spatio_temporal_res_block(p, f"up_blocks.{i}.resnets.{j}", h, emb, ioi)
            if block_type == "CrossAttnUpBlockSpatioTemporal":
                h = transformer_spatio_temporal(p, f"up_blocks.{i}.attentions.{j}", h,
                                                ehs, ioi, rev_heads[i], 1, None, {}, 1.0)
        if i < len(channels) - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = conv2d(p, f"up_blocks.{i}.upsamplers.0.conv", h)

    h = F.silu(torch.nn.functional.group_norm(h, 32, p("conv_norm_out.weight"),
                                              p("conv_norm_out.bias"), 1e-5))
    h = conv2d(p, "conv_out", h)
    return h.reshape(b, t, *h.shape[1:])
