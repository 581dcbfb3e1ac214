"""Composed-graph parity for the temporal VAE — encoder AND temporal decoder vs an
independent plain-torch transcription with identical exported weights.

The VAE bounds what the headline pipeline can output (every clip passes through
encode_mode and the temporal decode); until now its evidence was manifests + shape
tests. This transcribes diffusers' ``AutoencoderKLTemporalDecoder`` semantics
(channels-first, Conv3d temporal resblock halves, learned merge blender, single-head
mid attention, the asymmetric (0,1,0,1) encoder downsample pad, final (3,1,1) time
conv) and compares the composed forward at fp32. Reference component:
`pipeline/pipeline_stable_video_diffusion_trans.py:139,213,274`."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder, TemporalVAEConfig
from lkgd_tpu.utils.porting import export_state_dict, vae_export_key_map

CFG = TemporalVAEConfig(block_out_channels=(32, 64), layers_per_block=1)
B, T, H, W = 1, 3, 32, 32


def _conv(sd, prefix, x, stride=1, padding=1):
    return F.conv2d(x, sd[prefix + ".weight"], sd[prefix + ".bias"], stride=stride,
                    padding=padding)


def _gn(sd, prefix, x, eps):
    return F.group_norm(x, 32 if x.shape[1] >= 32 else x.shape[1],
                        sd[prefix + ".weight"], sd[prefix + ".bias"], eps)


def _resnet(sd, prefix, x, eps=1e-6):
    h = _conv(sd, prefix + ".conv1", F.silu(_gn(sd, prefix + ".norm1", x, eps)))
    h = _conv(sd, prefix + ".conv2", F.silu(_gn(sd, prefix + ".norm2", h, eps)))
    if (prefix + ".conv_shortcut.weight") in sd:
        x = _conv(sd, prefix + ".conv_shortcut", x, padding=0)
    return x + h


def _attn(sd, prefix, x):
    b, c, hh, ww = x.shape
    h = _gn(sd, prefix + ".group_norm", x, 1e-6).reshape(b, c, hh * ww).transpose(1, 2)
    q = h @ sd[prefix + ".to_q.weight"].T + sd[prefix + ".to_q.bias"]
    k = h @ sd[prefix + ".to_k.weight"].T + sd[prefix + ".to_k.bias"]
    v = h @ sd[prefix + ".to_v.weight"].T + sd[prefix + ".to_v.bias"]
    probs = torch.softmax(q @ k.transpose(-1, -2) * c**-0.5, dim=-1)
    o = probs @ v
    o = o @ sd[prefix + ".to_out.0.weight"].T + sd[prefix + ".to_out.0.bias"]
    return x + o.transpose(1, 2).reshape(b, c, hh, ww)


def _temporal_resblock(sd, prefix, x, num_frames):
    """SpatioTemporalResBlock, VAE flavor: spatial (eps 1e-6) + temporal (3,1,1) convs
    (eps 1e-5) + learned blender alpha = sigmoid(mix): out = a*spatial + (1-a)*temporal."""
    h = _resnet(sd, prefix + ".spatial_res_block", x, eps=1e-6)
    bf, c, hh, ww = h.shape
    b = bf // num_frames
    h5 = h.view(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)  # (B, C, T, H, W)
    tp = prefix + ".temporal_res_block"

    def gn5(name, t):
        return F.group_norm(t, 32 if t.shape[1] >= 32 else t.shape[1],
                            sd[f"{tp}.{name}.weight"], sd[f"{tp}.{name}.bias"], 1e-5)

    t = F.conv3d(F.silu(gn5("norm1", h5)), sd[tp + ".conv1.weight"],
                 sd[tp + ".conv1.bias"], padding=(1, 0, 0))
    t = F.conv3d(F.silu(gn5("norm2", t)), sd[tp + ".conv2.weight"],
                 sd[tp + ".conv2.bias"], padding=(1, 0, 0))
    t = h5 + t
    alpha = torch.sigmoid(sd[prefix + ".time_mixer.mix_factor"])[0]
    out = alpha * h5 + (1 - alpha) * t
    return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


def _torch_encode(sd, cfg, x_nchw):
    h = _conv(sd, "encoder.conv_in", torch.tensor(x_nchw))
    for i, _ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            h = _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", h)
        if i < len(cfg.block_out_channels) - 1:
            h = F.pad(h, (0, 1, 0, 1))
            h = F.conv2d(h, sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"],
                         sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"],
                         stride=2)
    h = _resnet(sd, "encoder.mid_block.resnets.0", h)
    h = _attn(sd, "encoder.mid_block.attentions.0", h)
    h = _resnet(sd, "encoder.mid_block.resnets.1", h)
    h = _conv(sd, "encoder.conv_out", F.silu(_gn(sd, "encoder.conv_norm_out", h, 1e-6)))
    return F.conv2d(h, sd["quant_conv.weight"], sd["quant_conv.bias"])


def _torch_decode(sd, cfg, z_nchw, num_frames):
    chs = cfg.block_out_channels
    h = _conv(sd, "decoder.conv_in", torch.tensor(z_nchw))
    h = _temporal_resblock(sd, "decoder.mid_block.resnets.0", h, num_frames)
    h = _attn(sd, "decoder.mid_block.attentions.0", h)
    h = _temporal_resblock(sd, "decoder.mid_block.resnets.1", h, num_frames)
    for i, _ch in enumerate(reversed(chs)):
        for j in range(cfg.layers_per_block + 1):
            h = _temporal_resblock(sd, f"decoder.up_blocks.{i}.resnets.{j}", h,
                                   num_frames)
        if i < len(chs) - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", h)
    h = _conv(sd, "decoder.conv_out", F.silu(_gn(sd, "decoder.conv_norm_out", h, 1e-6)))
    bf, c, hh, ww = h.shape
    b = bf // num_frames
    h5 = h.view(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
    h5 = F.conv3d(h5, sd["decoder.time_conv_out.weight"],
                  sd["decoder.time_conv_out.bias"], padding=(1, 0, 0))
    return h5.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


def test_temporal_vae_composed_parity():
    vae = AutoencoderKLTemporalDecoder(CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B * T, H, W, 3)).astype(np.float32) * 0.5

    params = vae.init(jax.random.PRNGKey(0), jnp.asarray(x), num_frames=T)
    leaves, treedef = jax.tree.flatten(params)
    r2 = np.random.default_rng(42)
    params = jax.tree.unflatten(treedef, [
        jnp.asarray(r2.normal(size=np.shape(l), scale=0.15), jnp.float32)
        for l in leaves])

    moments = np.asarray(vae.apply(params, jnp.asarray(x),
                                   method=AutoencoderKLTemporalDecoder.encode_moments))
    z = rng.standard_normal((B * T, H // 2, W // 2, CFG.latent_channels)).astype(
        np.float32)
    dec = np.asarray(vae.apply(params, jnp.asarray(z), T,
                               method=AutoencoderKLTemporalDecoder.decode))

    sd = {k: torch.tensor(v) for k, v in export_state_dict(
        params, key_map=vae_export_key_map).items()}

    want_m = _torch_encode(sd, CFG, x.transpose(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(moments, want_m.transpose(0, 2, 3, 1), rtol=1e-4,
                               atol=1e-4)
    want_d = _torch_decode(sd, CFG, z.transpose(0, 3, 1, 2), T).numpy()
    np.testing.assert_allclose(dec, want_d.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)
