"""Independent PyTorch transcription of the composed CogVideoX DiT forward — the
cross-framework oracle for `lkgd_tpu.models.cogvideox` (the second model family,
mirroring tests/torch_svd_unet_oracle.py for SVD).

Spec sources: the reference's modified transformer
(`/root/reference/CogVideo-main/finetune/models/cogvideox_i2v/cogvideox_transformer_3d.py`
— quaternion fusion :337-366, forward injection :478-585) and diffusers 0.27-line
CogVideoX semantics (adaLN-zero with a shared LayerNorm per norm module, joint
[text ∥ video] attention with per-head-dim qk layernorm, 3D RoPE with (d/4, 3d/8, 3d/8)
axis split, gelu-tanh FF over the joint stream, final adaLN + unpatchify). Weights come
in under the exported diffusers naming (export_state_dict + cogvideox_export_key_map)
through the same consumption-tracking ParamStore, so export coverage is asserted too.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from tests.torch_svd_unet_oracle import ParamStore, linear, sinusoidal_embedding


def layer_norm(p: ParamStore, prefix: str, x: torch.Tensor,
               eps: float = 1e-5) -> torch.Tensor:
    return F.layer_norm(x, (x.shape[-1],), p(f"{prefix}.weight"), p(f"{prefix}.bias"),
                        eps)


# --------------------------------------------------------------------------- fusion
def quaternion_linear(p: ParamStore, prefix: str, x: torch.Tensor) -> torch.Tensor:
    r, i, j, k = (p(f"{prefix}.{n}_weight") for n in "rijk")
    W = torch.cat([torch.cat([r, -i, -j, -k], 0), torch.cat([i, r, -k, j], 0),
                   torch.cat([j, k, r, -i], 0), torch.cat([k, -j, i, r], 0)], 1)
    return x @ W + p(f"{prefix}.bias")


def knowledge_fusion(p: ParamStore, ehs: torch.Tensor, domain: torch.Tensor,
                     flow: torch.Tensor, ctx_dim: int, knowledge_dim: int,
                     d: int) -> torch.Tensor:
    """LKGD quaternion+rFFT fusion, CogVideoX dims (reference
    cogvideox_transformer_3d.py:337-366,520-585): lconv ctx_dim->d, domain/flow
    interpolated to knowledge_dim then compressed to d; single knowledge token
    broadcast over all text tokens."""

    def compress(name, t, in_dim):
        w = p(f"quaternion_lora_{name}.weight")  # (d, in_dim // d)
        tg = t.reshape(*t.shape[:-1], d, in_dim // d)
        return torch.einsum("blog,og->blo", tg, w)

    lh = compress("lconv", ehs, ctx_dim)
    ld = compress("dconv", F.interpolate(domain, size=knowledge_dim, mode="linear"),
                  knowledge_dim)
    lf = compress("fconv", F.interpolate(flow, size=knowledge_dim, mode="linear"),
                  knowledge_dim)
    if ld.shape[1] != lh.shape[1] and ld.shape[1] == 1:
        ld = ld.expand_as(lh)
        lf = lf.expand_as(lh)
    if ld.shape[0] != lh.shape[0] and ld.shape[0] == 1:
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


# --------------------------------------------------------------------------- rope
def rope_3d(t: int, h: int, w: int, head_dim: int):
    """diffusers get_3d_rotary_pos_embed: head_dim split (d/4, 3d/8, 3d/8),
    interleaved frequency duplication."""

    def freqs(n, dim):
        inv = 1.0 / (10000.0 ** (torch.arange(0, dim, 2, dtype=torch.float64) / dim))
        f = torch.outer(torch.arange(n, dtype=torch.float64), inv)
        return torch.repeat_interleave(f, 2, dim=-1)

    ft = freqs(t, head_dim // 4)[:, None, None, :].expand(t, h, w, head_dim // 4)
    fh = freqs(h, head_dim * 3 // 8)[None, :, None, :].expand(t, h, w, head_dim * 3 // 8)
    fw = freqs(w, head_dim * 3 // 8)[None, None, :, :].expand(t, h, w, head_dim * 3 // 8)
    f = torch.cat([ft, fh, fw], dim=-1).reshape(-1, head_dim).float()
    return f.cos(), f.sin()


def apply_rotary(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor) -> torch.Tensor:
    x1, x2 = x[..., 0::2], x[..., 1::2]
    rot = torch.stack([-x2, x1], dim=-1).reshape(x.shape)
    return x * cos[None, :, None, :] + rot * sin[None, :, None, :]


def sincos_pos_embed_3d(dim: int, t: int, h: int, w: int, spatial_scale: float,
                        temporal_scale: float) -> torch.Tensor:
    """diffusers get_3d_sincos_pos_embed (CogVideoX-2b)."""

    def sincos_1d(d, pos):
        omega = 1.0 / (10000.0 ** (np.arange(d // 2, dtype=np.float64) / (d / 2.0)))
        out = np.asarray(pos, np.float64)[:, None] * omega[None]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    dim_sp, dim_t = 3 * dim // 4, dim // 4
    gw, gh = np.meshgrid(np.arange(w) / spatial_scale, np.arange(h) / spatial_scale)
    spatial = np.concatenate([sincos_1d(dim_sp // 2, gw.reshape(-1)),
                              sincos_1d(dim_sp // 2, gh.reshape(-1))], axis=1)
    temporal = sincos_1d(dim_t, np.arange(t) / temporal_scale)
    pos = np.concatenate([np.repeat(temporal[:, None, :], h * w, axis=1),
                          np.repeat(spatial[None, :, :], t, axis=0)], axis=2)
    return torch.tensor(pos.reshape(t * h * w, dim), dtype=torch.float32)


# --------------------------------------------------------------------------- blocks
def adaln_zero(p: ParamStore, prefix: str, hidden, encoder, temb):
    out = linear(p, f"{prefix}.linear", F.silu(temb))
    shift, scale, gate, e_shift, e_scale, e_gate = out.chunk(6, dim=-1)
    nh = layer_norm(p, f"{prefix}.norm", hidden) * (1 + scale[:, None]) + shift[:, None]
    p.used.add(f"{prefix}.norm.weight")  # shared norm consumed twice (video + text)
    ne = layer_norm(p, f"{prefix}.norm", encoder) * (1 + e_scale[:, None]) + e_shift[:, None]
    return nh, ne, gate[:, None], e_gate[:, None]


def attention(p: ParamStore, prefix: str, hidden, encoder, rope, heads: int):
    text_len = encoder.shape[1]
    x = torch.cat([encoder, hidden], dim=1)
    b, s, inner = x.shape[0], x.shape[1], None
    q = linear(p, f"{prefix}.to_q", x)
    k = linear(p, f"{prefix}.to_k", x)
    v = linear(p, f"{prefix}.to_v", x)
    inner = q.shape[-1]
    d = inner // heads
    q = q.view(b, s, heads, d)
    k = k.view(b, s, heads, d)
    v = v.view(b, s, heads, d)
    q = F.layer_norm(q, (d,), p(f"{prefix}.norm_q.weight"), p(f"{prefix}.norm_q.bias"),
                     1e-6)
    k = F.layer_norm(k, (d,), p(f"{prefix}.norm_k.weight"), p(f"{prefix}.norm_k.bias"),
                     1e-6)
    if rope is not None:
        cos, sin = rope
        q = torch.cat([q[:, :text_len], apply_rotary(q[:, text_len:], cos, sin)], dim=1)
        k = torch.cat([k[:, :text_len], apply_rotary(k[:, text_len:], cos, sin)], dim=1)
    qh, kh, vh = (z.transpose(1, 2) for z in (q, k, v))
    probs = torch.softmax(qh @ kh.transpose(-1, -2) * d**-0.5, dim=-1)
    out = (probs @ vh).transpose(1, 2).reshape(b, s, inner)
    out = linear(p, f"{prefix}.to_out.0", out)
    return out[:, text_len:], out[:, :text_len]


def block(p: ParamStore, prefix: str, hidden, encoder, temb, rope, heads: int):
    text_len = encoder.shape[1]
    nh, ne, gate, e_gate = adaln_zero(p, f"{prefix}.norm1", hidden, encoder, temb)
    ah, ae = attention(p, f"{prefix}.attn1", nh, ne, rope, heads)
    hidden = hidden + gate * ah
    encoder = encoder + e_gate * ae
    nh, ne, gate_ff, e_gate_ff = adaln_zero(p, f"{prefix}.norm2", hidden, encoder, temb)
    x = torch.cat([ne, nh], dim=1)
    h = F.gelu(linear(p, f"{prefix}.ff.net.0.proj", x), approximate="tanh")
    h = linear(p, f"{prefix}.ff.net.2", h)
    return hidden + gate_ff * h[:, text_len:], encoder + e_gate_ff * h[:, :text_len]


# --------------------------------------------------------------------------- model
def cogvideox_forward(p: ParamStore, cfg: dict, hidden_states: torch.Tensor,
                      encoder_hidden_states: torch.Tensor, timestep: torch.Tensor,
                      domain: torch.Tensor = None,
                      flow: torch.Tensor = None) -> torch.Tensor:
    """Composed CogVideoX DiT forward. ``hidden_states`` (B, T, C, H, W) channels-first;
    returns the same layout. ``cfg`` keys: num_layers, num_attention_heads,
    attention_head_dim, patch_size, patch_size_t, out_channels, text_embed_dim,
    use_rope, spatial/temporal_interpolation_scale."""
    b, t, c, hh, ww = hidden_states.shape
    pch = cfg["patch_size"]
    pt = cfg.get("patch_size_t")
    heads = cfg["num_attention_heads"]
    inner = heads * cfg["attention_head_dim"]

    temb = sinusoidal_embedding(timestep.expand(b), inner)
    emb = linear(p, "time_embedding.linear_2",
                 F.silu(linear(p, "time_embedding.linear_1", temb)))

    if domain is not None:
        ted = cfg["text_embed_dim"]
        d = min(256, ted // 4)
        kdim = max(1024 * d // 256, 4 * d)
        encoder_hidden_states = knowledge_fusion(p, encoder_hidden_states, domain, flow,
                                                 ted, kdim, d)

    if pt is None:
        video = hidden_states.reshape(b * t, c, hh, ww)
        video = F.conv2d(video, p("patch_embed.proj.weight"), p("patch_embed.proj.bias"),
                         stride=pch)
        video = video.reshape(b, t, inner, -1).permute(0, 1, 3, 2).reshape(b, -1, inner)
    else:
        v = hidden_states.permute(0, 1, 3, 4, 2).reshape(  # -> (B, T, H, W, C)
            b, t // pt, pt, hh // pch, pch, ww // pch, pch, c)
        v = v.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, (t // pt) * (hh // pch) * (ww // pch), pt * pch * pch * c)
        video = linear(p, "patch_embed.proj", v)
    text = linear(p, "patch_embed.text_proj", encoder_hidden_states)

    if cfg.get("use_rope", True):
        rope = rope_3d(t // (pt or 1), hh // pch, ww // pch, cfg["attention_head_dim"])
    else:
        rope = None
        video = video + sincos_pos_embed_3d(
            inner, t // (pt or 1), hh // pch, ww // pch,
            cfg.get("spatial_interpolation_scale", 1.875),
            cfg.get("temporal_interpolation_scale", 1.0))[None]

    hidden, encoder = video, text
    for i in range(cfg["num_layers"]):
        hidden, encoder = block(p, f"transformer_blocks.{i}", hidden, encoder, emb,
                                rope, heads)

    joint = layer_norm(p, "norm_final", torch.cat([encoder, hidden], dim=1))
    hidden = joint[:, encoder.shape[1]:]

    ada = linear(p, "norm_out.linear", F.silu(emb))
    shift, scale = ada.chunk(2, dim=-1)
    hidden = F.layer_norm(hidden, (inner,), None, None, 1e-5)
    hidden = hidden * (1 + scale[:, None]) + shift[:, None]
    hidden = linear(p, "proj_out", hidden)

    oc = cfg["out_channels"]
    if pt is None:
        out = hidden.reshape(b, t, hh // pch, ww // pch, pch, pch, oc)
        out = out.permute(0, 1, 6, 2, 4, 3, 5).reshape(b, t, oc, hh, ww)
    else:
        out = hidden.reshape(b, t // pt, hh // pch, ww // pch, pt, pch, pch, oc)
        out = out.permute(0, 1, 4, 7, 2, 5, 3, 6).reshape(b, t, oc, hh, ww)
    return out
