"""Independent PyTorch transcription of the composed SVD UNet forward — the
cross-framework numerical oracle for `lkgd_tpu.models.unet_svd`.

This is NOT a port of our Flax code and NOT a copy of the reference: it is a from-scratch,
diffusers-free torch re-derivation of the same spec the Flax model implements —
`/root/reference/models/unet_spatio_temporal_condition.py:448-688` (composed graph),
diffusers 0.27.2 `unet_3d_blocks`/`resnet`/`transformer_temporal` semantics (block
vocabulary), and the LKGD runtime patch (`/root/reference/patch/patch.py:390-686` joint
attention, `:57-92` masked LoRA, `:143-190` joint layer init). Everything here is written
in torch's native channels-first layout with explicit loops, so a wiring bug in the Flax
side (skip order, alpha blending, stream routing, frame flips, broadcastings) cannot be
reproduced here by construction.

Weights come in as a *diffusers-naming* flat state dict — exactly what
`lkgd_tpu.utils.porting.export_state_dict(params, key_map=svd_export_key_map)` emits and
what the real HF checkpoints contain — through a consumption-tracking store: the test
asserts every tensor was consumed exactly once, so the oracle doubles as a name-coverage
audit of the exporter.

Known divergences from diffusers 0.27.2 that are deliberate (documented, not bugs):
  * GroupNorm eps inside spatio-temporal resblocks: we use 1e-5 uniformly (the value the
    reference passes as `resnet_eps` at unet:179,280, and the torch-GroupNorm default the
    original sgm training used; diffusers' get_down/up_block do not forward resnet_eps —
    each SpatioTemporal block class hard-codes its own 1e-5/1e-6 mix). SETTLED r5 to the
    extent this environment allows: diffusers source is unreachable (not installed, zero
    egress, no vendored copy), the sensitivity is MEASURED (experiments/eps_sensitivity.py:
    random-init worst case max |delta| = 5.1% of output std fp32; trained-weight analytic
    scale ~4.5e-6 relative), and `SVDUNetConfig.resnet_eps{,_cross,_up}` can express any
    per-block-type mix for bit-parity once real checkpoints flow through
    cli/verify_parity record/check. The oracle mirrors the Flax default (1e-5).
  * `time_context` row order for temporal cross-attention is batch-major (sample-aligned),
    matching our Flax per-sample K/V.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


class ParamStore:
    """Flat diffusers-named tensor store with exactly-once consumption tracking."""

    def __init__(self, state_dict):
        self.sd = {k: (torch.from_numpy(np.asarray(v)).float() if not torch.is_tensor(v)
                       else v.float()) for k, v in state_dict.items()}
        self.used = set()

    def __call__(self, key: str) -> torch.Tensor:
        if key not in self.sd:
            raise KeyError(f"oracle: missing weight {key!r}")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def adapters_on(self, prefix: str):
        """Adapter names attached to projection `prefix` (discovered from the checkpoint
        keys, the way the reference discovers loaded peft adapters)."""
        names = []
        for k in self.sd:
            if k.startswith(prefix + ".lora_") and k.endswith("_A"):
                names.append(k[len(prefix) + len(".lora_"):-len("_A")])
        return sorted(names)

    def unused(self):
        return sorted(set(self.sd) - self.used)


# --------------------------------------------------------------------------- primitives
def linear(p: ParamStore, prefix: str, x: torch.Tensor, bias: bool = True) -> torch.Tensor:
    w = p(f"{prefix}.weight")  # torch layout (out, in)
    y = x @ w.t()
    if bias:
        y = y + p(f"{prefix}.bias")
    return y


def lora_linear(p: ParamStore, prefix: str, x: torch.Tensor, lora_cfg, bias: bool = True,
                invert: bool = False) -> torch.Tensor:
    """Linear + masked multi-adapter LoRA (reference `patch/patch.py:57-92`:
    ``result[lora_mask] += lora_B(lora_A(x[lora_mask])) * scaling``). ``lora_cfg`` is
    ``{name: (alpha, stream_mask)}``; ``invert`` flips the stream mask — the reference
    applies inverted masks to ``attn1n.to_k/to_v`` (`patch/patch.py:892-895`)."""
    y = linear(p, prefix, x, bias=bias)
    for name in p.adapters_on(prefix):
        a = p(f"{prefix}.lora_{name}_A")  # exported layout (in, r)
        b = p(f"{prefix}.lora_{name}_B")  # (r, out)
        alpha, streams = lora_cfg[name]
        scaling = alpha / a.shape[1]
        delta = (x @ a @ b) * scaling
        if streams:
            mask = torch.tensor(streams, dtype=torch.bool)
            if invert:
                mask = ~mask
            rows = mask.repeat_interleave(x.shape[0] // len(mask))
            y[rows] = y[rows] + delta[rows]
        else:
            y = y + delta
    return y


def conv2d(p: ParamStore, prefix: str, x: torch.Tensor, stride: int = 1,
           padding: int = 1) -> torch.Tensor:
    return F.conv2d(x, p(f"{prefix}.weight"), p(f"{prefix}.bias"), stride=stride,
                    padding=padding)


def group_norm(p: ParamStore, prefix: str, x: torch.Tensor, groups: int = 32,
               eps: float = 1e-5) -> torch.Tensor:
    return F.group_norm(x, groups, p(f"{prefix}.weight"), p(f"{prefix}.bias"), eps)


def layer_norm(p: ParamStore, prefix: str, x: torch.Tensor) -> torch.Tensor:
    return F.layer_norm(x, (x.shape[-1],), p(f"{prefix}.weight"), p(f"{prefix}.bias"), 1e-5)


def sinusoidal_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers `Timesteps(dim, flip_sin_to_cos=True, downscale_freq_shift=0)`."""
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


def timestep_embedding_mlp(p: ParamStore, prefix: str, x: torch.Tensor) -> torch.Tensor:
    return linear(p, f"{prefix}.linear_2", F.silu(linear(p, f"{prefix}.linear_1", x)))


def attention_core(q: torch.Tensor, k: torch.Tensor, v: torch.Tensor,
                   heads: int) -> torch.Tensor:
    b, sq, inner = q.shape
    d = inner // heads
    q = q.view(b, sq, heads, d).transpose(1, 2)
    k = k.view(b, k.shape[1], heads, d).transpose(1, 2)
    v = v.view(b, v.shape[1], heads, d).transpose(1, 2)
    probs = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, dim=-1)
    return (probs @ v).transpose(1, 2).reshape(b, sq, inner)


def attention(p: ParamStore, prefix: str, x: torch.Tensor, ctx: torch.Tensor, heads: int,
              lora_cfg) -> torch.Tensor:
    """diffusers `Attention` as configured by SVD (no qkv bias, out bias) with the masked
    LoRA hook; `attn1n` K/V adapters get inverted stream masks."""
    invert_kv = prefix.endswith("attn1n")
    q = lora_linear(p, f"{prefix}.to_q", x, lora_cfg, bias=False)
    k = lora_linear(p, f"{prefix}.to_k", ctx, lora_cfg, bias=False, invert=invert_kv)
    v = lora_linear(p, f"{prefix}.to_v", ctx, lora_cfg, bias=False, invert=invert_kv)
    out = attention_core(q, k, v, heads)
    return lora_linear(p, f"{prefix}.to_out.0", out, lora_cfg)


def geglu_ff(p: ParamStore, prefix: str, x: torch.Tensor) -> torch.Tensor:
    h = linear(p, f"{prefix}.net.0.proj", x)
    h, gate = h.chunk(2, dim=-1)
    return linear(p, f"{prefix}.net.2", h * F.gelu(gate))


def alpha_blend(p: ParamStore, prefix: str, x_spatial: torch.Tensor,
                x_temporal: torch.Tensor, image_only_indicator: torch.Tensor,
                switch: bool) -> torch.Tensor:
    """diffusers AlphaBlender merge_strategy='learned_with_images'."""
    mix = p(f"{prefix}.mix_factor")
    alpha = torch.where(image_only_indicator.bool(), torch.ones_like(image_only_indicator),
                        torch.sigmoid(mix)[0] * torch.ones_like(image_only_indicator))
    if x_spatial.ndim == 5:  # (B, C, T, H, W)
        alpha = alpha[:, None, :, None, None]
    else:  # (B*T, HW, C): per-frame scalar
        alpha = alpha.reshape(-1)[:, None, None]
    if switch:
        alpha = 1.0 - alpha
    return alpha * x_spatial + (1.0 - alpha) * x_temporal


# --------------------------------------------------------------------------- resblocks
def resnet_block_2d(p: ParamStore, prefix: str, x: torch.Tensor,
                    temb: torch.Tensor) -> torch.Tensor:
    h = conv2d(p, f"{prefix}.conv1", F.silu(group_norm(p, f"{prefix}.norm1", x)))
    h = h + linear(p, f"{prefix}.time_emb_proj", F.silu(temb))[:, :, None, None]
    h = conv2d(p, f"{prefix}.conv2", F.silu(group_norm(p, f"{prefix}.norm2", h)))
    if p.has(f"{prefix}.conv_shortcut.weight"):
        x = conv2d(p, f"{prefix}.conv_shortcut", x, padding=0)
    return x + h


def temporal_resnet_block(p: ParamStore, prefix: str, x: torch.Tensor,
                          temb: torch.Tensor) -> torch.Tensor:
    """diffusers TemporalResnetBlock: (3,1,1) Conv3d over (B, C, T, H, W);
    temb is (B, T, C_out)."""

    def gn3d(name, h):
        return F.group_norm(h, 32, p(f"{prefix}.{name}.weight"), p(f"{prefix}.{name}.bias"),
                            1e-5)

    h = F.conv3d(F.silu(gn3d("norm1", x)), p(f"{prefix}.conv1.weight"),
                 p(f"{prefix}.conv1.bias"), padding=(1, 0, 0))
    t = linear(p, f"{prefix}.time_emb_proj", F.silu(temb))  # (B, T, C_out)
    h = h + t.permute(0, 2, 1)[:, :, :, None, None]
    h = F.conv3d(F.silu(gn3d("norm2", h)), p(f"{prefix}.conv2.weight"),
                 p(f"{prefix}.conv2.bias"), padding=(1, 0, 0))
    return x + h


def spatio_temporal_res_block(p: ParamStore, prefix: str, x: torch.Tensor,
                              temb: torch.Tensor,
                              image_only_indicator: torch.Tensor) -> torch.Tensor:
    num_frames = image_only_indicator.shape[-1]
    h = resnet_block_2d(p, f"{prefix}.spatial_res_block", x, temb)
    bf, c, hh, ww = h.shape
    b = bf // num_frames
    h5 = h.view(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)  # (B, C, T, H, W)
    temb_t = temb.view(b, num_frames, -1)
    mix = temporal_resnet_block(p, f"{prefix}.temporal_res_block", h5, temb_t)
    out = alpha_blend(p, f"{prefix}.time_mixer", h5, mix, image_only_indicator, switch=True)
    return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


# --------------------------------------------------------------------------- joint branch
def partner_swap(x: torch.Tensor, mask) -> torch.Tensor:
    """Swap stream halves along the batch axis (reference `patch/patch.py:466-468`)."""
    m = torch.tensor(mask, dtype=torch.bool)
    rows = m.repeat_interleave(x.shape[0] // len(m))
    out = torch.empty_like(x)
    out[~rows] = x[rows]
    out[rows] = x[~rows]
    return out


def joint_branch(p: ParamStore, prefix: str, norm_x: torch.Tensor, heads: int, joint,
                 lora_cfg, num_frames: int, allow_flip: bool,
                 temb: torch.Tensor = None) -> torch.Tensor:
    """attn1n + zero-init post projection (reference `patch/patch.py:438-500` spatial,
    `:617-660` temporal — the temporal path never flips). ``add_norm``: AdaLN on the
    joint input conditioned on temb (patch.py:163-169, zero-init linear)."""
    if joint.get("add_norm"):
        ada = linear(p, f"{prefix}.norm1n.linear", F.silu(temb))
        shift, scale = ada.chunk(2, dim=-1)
        norm_x = F.layer_norm(norm_x, (norm_x.shape[-1],), None, None, 1e-6)
        norm_x = norm_x * (1 + scale[:, None]) + shift[:, None]
    partner = partner_swap(norm_x, joint["mask"])
    if allow_flip and joint.get("flip"):
        bt, n, c = partner.shape
        partner = partner.view(bt // num_frames, num_frames, n, c).flip(dims=[1])
        partner = partner.reshape(bt, n, c)
    out = attention(p, f"{prefix}.attn1n", norm_x, partner, heads, lora_cfg)
    post = joint.get("post", "conv")
    if post == "conv":
        out = out @ p(f"{prefix}.conv1n.weight").t()
    elif post == "scale":
        out = out * p(f"{prefix}.scale1n")
    elif post == "conv_fuse":
        m = torch.tensor(joint["mask"], dtype=torch.bool)
        rows = m.repeat_interleave(out.shape[0] // len(m))
        fused = torch.cat([out[rows], out[~rows]], dim=-1) @ p(f"{prefix}.conv1n.weight").t()
        fx, fy = fused.chunk(2, dim=-1)
        out = out.clone()
        out[rows] = fx
        out[~rows] = fy
    return out


# --------------------------------------------------------------------------- transformer
def basic_transformer_block(p: ParamStore, prefix: str, x: torch.Tensor,
                            ehs: torch.Tensor, heads: int, joint, lora_cfg,
                            num_frames: int, joint_scale: float,
                            temb: torch.Tensor = None) -> torch.Tensor:
    norm_x = layer_norm(p, f"{prefix}.norm1", x)
    attn = attention(p, f"{prefix}.attn1", norm_x, norm_x, heads, lora_cfg)
    if joint is not None and joint.get("spatial", True):
        attn = attn + joint_scale * joint_branch(p, prefix, norm_x, heads, joint, lora_cfg,
                                                 num_frames, allow_flip=True, temb=temb)
    x = x + attn
    norm_x = layer_norm(p, f"{prefix}.norm2", x)
    x = x + attention(p, f"{prefix}.attn2", norm_x, ehs, heads, lora_cfg)
    return x + geglu_ff(p, f"{prefix}.ff", layer_norm(p, f"{prefix}.norm3", x))


def temporal_transformer_block(p: ParamStore, prefix: str, x: torch.Tensor,
                               num_frames: int, time_context: torch.Tensor, heads: int,
                               joint, lora_cfg) -> torch.Tensor:
    """diffusers TemporalBasicTransformerBlock on (B*T, HW, C): permutes to per-pixel
    (B*HW, T, C) tokens (reference `patch/patch.py:593-597`). No joint_scale and no flip
    on the temporal joint branch (`patch/patch.py:655-660`)."""
    bf, hw, c = x.shape
    b = bf // num_frames
    x = x.view(b, num_frames, hw, c).permute(0, 2, 1, 3).reshape(b * hw, num_frames, c)
    x = x + geglu_ff(p, f"{prefix}.ff_in", layer_norm(p, f"{prefix}.norm_in", x))

    norm_x = layer_norm(p, f"{prefix}.norm1", x)
    attn = attention(p, f"{prefix}.attn1", norm_x, norm_x, heads, lora_cfg)
    if joint is not None and joint.get("temporal", False):
        attn = attn + joint_branch(p, prefix, norm_x, heads, joint, lora_cfg, num_frames,
                                   allow_flip=False)
    x = x + attn
    norm_x = layer_norm(p, f"{prefix}.norm2", x)
    ctx = time_context.repeat_interleave(hw, dim=0)  # (B*HW, L, D), batch-major
    x = x + attention(p, f"{prefix}.attn2", norm_x, ctx, heads, lora_cfg)
    x = x + geglu_ff(p, f"{prefix}.ff", layer_norm(p, f"{prefix}.norm3", x))
    return x.view(b, hw, num_frames, c).permute(0, 2, 1, 3).reshape(bf, hw, c)


def transformer_spatio_temporal(p: ParamStore, prefix: str, x: torch.Tensor,
                                ehs: torch.Tensor, image_only_indicator: torch.Tensor,
                                heads: int, num_layers: int, joint, lora_cfg,
                                joint_scale: float) -> torch.Tensor:
    bf, c, hh, ww = x.shape
    num_frames = image_only_indicator.shape[-1]
    b = bf // num_frames
    time_context = ehs.view(b, num_frames, *ehs.shape[1:])[:, 0]  # (B, L, D), frame 0

    residual = x
    h = group_norm(p, f"{prefix}.norm", x, eps=1e-6)
    h = h.permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
    h = linear(p, f"{prefix}.proj_in", h)

    frame_ids = torch.arange(num_frames, dtype=torch.float32).repeat(b)
    emb = timestep_embedding_mlp(p, f"{prefix}.time_pos_embed",
                                 sinusoidal_embedding(frame_ids, h.shape[-1]))[:, None, :]

    for i in range(num_layers):
        h = basic_transformer_block(p, f"{prefix}.transformer_blocks.{i}", h, ehs, heads,
                                    joint, lora_cfg, num_frames, joint_scale)
        h_mix = temporal_transformer_block(
            p, f"{prefix}.temporal_transformer_blocks.{i}", h + emb, num_frames,
            time_context, heads, joint, lora_cfg)
        h = alpha_blend(p, f"{prefix}.time_mixer", h, h_mix, image_only_indicator,
                        switch=False)

    h = linear(p, f"{prefix}.proj_out", h)
    return h.reshape(bf, hh, ww, c).permute(0, 3, 1, 2) + residual


# --------------------------------------------------------------------------- fusion
def quaternion_linear(p: ParamStore, prefix: str, x: torch.Tensor) -> torch.Tensor:
    """core_qnn QuaternionLinearAutograd: Hamilton-product structured weight."""
    r, i, j, k = (p(f"{prefix}.{n}_weight") for n in "rijk")
    W = torch.cat([torch.cat([r, -i, -j, -k], 0), torch.cat([i, r, -k, j], 0),
                   torch.cat([j, k, r, -i], 0), torch.cat([k, -j, i, r], 0)], 1)
    return x @ W + p(f"{prefix}.bias")


def knowledge_fusion(p: ParamStore, ehs: torch.Tensor, domain: torch.Tensor,
                     flow: torch.Tensor, ctx_dim: int) -> torch.Tensor:
    """LKGD quaternion+rFFT fusion (reference unet :536-595), generalized from the
    hard-coded 1024 to ctx_dim."""
    d = ctx_dim // 4

    def compress(name, t):
        w = p(f"quaternion_lora_{name}.weight")  # (d, group) depthwise conv1d
        tg = t.reshape(*t.shape[:-1], d, t.shape[-1] // d)
        return torch.einsum("blog,og->blo", tg, w)

    lh = compress("lconv", ehs)
    ld = compress("dconv", F.interpolate(domain, size=ctx_dim, mode="linear"))
    lf = compress("fconv", F.interpolate(flow, size=ctx_dim, mode="linear"))
    if ld.shape[0] != lh.shape[0] and ld.shape[0] == 1:  # CFG-doubled ctx (ref :545-547)
        ld = torch.cat([ld, ld], dim=0)
        lf = torch.cat([lf, lf], dim=0)
    ctx_learn = p("quaternion_lora_texts").expand_as(lh)

    spatial = quaternion_linear(p, "quaternion_lora_fuse",
                                torch.cat([lh, ld, lf, ctx_learn], -1))

    ffts = [torch.fft.rfft(t, dim=-1) for t in (lh, ld, lf)]
    mags = [f.abs() for f in ffts] + [p("quaternion_lora_texts_fft_mag").expand_as(ffts[0].real)]
    phas = [f.angle() for f in ffts] + [p("quaternion_lora_texts_fft_pha").expand_as(ffts[0].real)]
    mag = quaternion_linear(p, "quaternion_lora_fuse_fft_mag",
                            torch.cat([m[..., :-1] for m in mags], -1))
    pha = quaternion_linear(p, "quaternion_lora_fuse_fft_pha",
                            torch.cat([q[..., :-1] for q in phas], -1))
    spec = torch.complex(mag * pha.cos(), mag * pha.sin())
    mag0 = linear(p, "quaternion_lora_fuse_fft_mag0",
                  torch.stack([m[..., -1] for m in mags], -1))
    pha0 = linear(p, "quaternion_lora_fuse_fft_pha0",
                  torch.stack([q[..., -1] for q in phas], -1))
    spec0 = torch.complex(mag0 * pha0.cos(), mag0 * pha0.sin())
    spectral = torch.fft.irfft(torch.cat([spec, spec0], -1), dim=-1)

    h = torch.cat([spatial, spectral], -1)
    h = F.leaky_relu(linear(p, "quaternion_lora_fuse_sf.0", h), 0.1)
    return linear(p, "quaternion_lora_fuse_sf.2", h)


# --------------------------------------------------------------------------- UNet
def unet_forward(p: ParamStore, cfg: dict, sample: torch.Tensor, timestep: torch.Tensor,
                 ehs: torch.Tensor, added_time_ids: torch.Tensor,
                 domain: torch.Tensor = None, flow: torch.Tensor = None,
                 joint: dict = None, lora_cfg: dict = None,
                 joint_scale: float = 1.0) -> torch.Tensor:
    """Composed SVD UNet forward (reference unet :448-688). ``sample`` is
    (B, T, C, H, W) channels-first; returns the same layout.

    ``joint``: {post, mask, flip, spatial, temporal} (reference apply_patch flags);
    ``lora_cfg``: {adapter_name: (alpha, stream_mask)} for adapters present in ``p``.
    """
    lora_cfg = lora_cfg or {}
    b, t = sample.shape[:2]
    channels = list(cfg["block_out_channels"])
    heads = list(cfg["num_attention_heads"])
    layers_per_block = cfg["layers_per_block"]
    n_tf_layers = cfg.get("transformer_layers_per_block", 1)

    t_emb = sinusoidal_embedding(timestep.expand(b), channels[0])
    emb = timestep_embedding_mlp(p, "time_embedding", t_emb)
    add_embeds = sinusoidal_embedding(added_time_ids.reshape(-1), 256).reshape(b, -1)
    emb = emb + timestep_embedding_mlp(p, "add_embedding", add_embeds)

    if domain is not None:
        ehs = knowledge_fusion(p, ehs, domain, flow, cfg["cross_attention_dim"])

    sample = sample.reshape(b * t, *sample.shape[2:])
    emb = emb.repeat_interleave(t, dim=0)
    ehs = ehs.repeat_interleave(t, dim=0)
    image_only_indicator = torch.zeros(b, t)

    h = conv2d(p, "conv_in", sample)

    res_samples = [h]
    for i, block_type in enumerate(cfg["down_block_types"]):
        is_last = i == len(channels) - 1
        for j in range(layers_per_block):
            h = spatio_temporal_res_block(p, f"down_blocks.{i}.resnets.{j}", h, emb,
                                          image_only_indicator)
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                h = transformer_spatio_temporal(
                    p, f"down_blocks.{i}.attentions.{j}", h, ehs, image_only_indicator,
                    heads[i], n_tf_layers, joint, lora_cfg, joint_scale)
            res_samples.append(h)
        if not is_last:
            h = conv2d(p, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2)
            res_samples.append(h)

    h = spatio_temporal_res_block(p, "mid_block.resnets.0", h, emb, image_only_indicator)
    h = transformer_spatio_temporal(p, "mid_block.attentions.0", h, ehs,
                                    image_only_indicator, heads[-1], n_tf_layers, joint,
                                    lora_cfg, joint_scale)
    h = spatio_temporal_res_block(p, "mid_block.resnets.1", h, emb, image_only_indicator)

    rev_channels = channels[::-1]
    rev_heads = heads[::-1]
    for i, block_type in enumerate(cfg["up_block_types"]):
        for j in range(layers_per_block + 1):
            skip = res_samples.pop()
            h = torch.cat([h, skip], dim=1)
            h = spatio_temporal_res_block(p, f"up_blocks.{i}.resnets.{j}", h, emb,
                                          image_only_indicator)
            if block_type == "CrossAttnUpBlockSpatioTemporal":
                h = transformer_spatio_temporal(
                    p, f"up_blocks.{i}.attentions.{j}", h, ehs, image_only_indicator,
                    rev_heads[i], n_tf_layers, joint, lora_cfg, joint_scale)
        if i < len(channels) - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = conv2d(p, f"up_blocks.{i}.upsamplers.0.conv", h)

    h = F.silu(group_norm(p, "conv_norm_out", h))
    h = conv2d(p, "conv_out", h)
    return h.reshape(b, t, *h.shape[1:])
