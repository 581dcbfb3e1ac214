"""MiDaS DPT-hybrid vs an independent plain-torch transcription (tiny config), fed a
synthetic state dict in EXACT isl-org dpt_hybrid naming through the strict porter —
verifies both the architecture math and the key map (reference depth preprocessor,
`utils/controlnet_utils.py:104-106`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from lkgd_tpu.models.midas import DPTHybridDepth, MidasConfig, port_midas

CFG = MidasConfig.tiny()


def _synthetic_sd(cfg: MidasConfig, seed=0):
    """Random state dict with the exact isl-org/timm key names + torch layouts."""
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.2):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    sd = {}
    p = "pretrained.model.patch_embed.backbone."
    sd[p + "stem.conv.weight"] = w(cfg.stem_width, 3, 7, 7)
    sd[p + "stem.norm.weight"] = 1 + w(cfg.stem_width, scale=0.05)
    sd[p + "stem.norm.bias"] = w(cfg.stem_width)
    width, in_ch = cfg.stem_width * 4, cfg.stem_width
    for si, n_blocks in enumerate(cfg.resnet_layers):
        for bi in range(n_blocks):
            bp = p + f"stages.{si}.blocks.{bi}."
            mid = width // 4
            if in_ch != width or si > 0 and bi == 0:
                sd[bp + "downsample.conv.weight"] = w(width, in_ch, 1, 1)
                sd[bp + "downsample.norm.weight"] = 1 + w(width, scale=0.05)
                sd[bp + "downsample.norm.bias"] = w(width)
            sd[bp + "conv1.weight"] = w(mid, in_ch, 1, 1)
            sd[bp + "norm1.weight"] = 1 + w(mid, scale=0.05)
            sd[bp + "norm1.bias"] = w(mid)
            sd[bp + "conv2.weight"] = w(mid, mid, 3, 3)
            sd[bp + "norm2.weight"] = 1 + w(mid, scale=0.05)
            sd[bp + "norm2.bias"] = w(mid)
            sd[bp + "conv3.weight"] = w(width, mid, 1, 1)
            sd[bp + "norm3.weight"] = 1 + w(width, scale=0.05)
            sd[bp + "norm3.bias"] = w(width)
            in_ch = width
        width *= 2
    backbone_out = in_ch

    d = cfg.vit_dim
    v = "pretrained.model."
    sd[v + "cls_token"] = w(1, 1, d)
    g = cfg.image_size // 16
    sd[v + "pos_embed"] = w(1, g * g + 1, d)
    sd[v + "patch_embed.proj.weight"] = w(d, backbone_out, 1, 1)
    sd[v + "patch_embed.proj.bias"] = w(d)
    for i in range(cfg.vit_depth):
        bp = v + f"blocks.{i}."
        sd[bp + "norm1.weight"] = 1 + w(d, scale=0.05)
        sd[bp + "norm1.bias"] = w(d)
        sd[bp + "attn.qkv.weight"] = w(3 * d, d)
        sd[bp + "attn.qkv.bias"] = w(3 * d)
        sd[bp + "attn.proj.weight"] = w(d, d)
        sd[bp + "attn.proj.bias"] = w(d)
        sd[bp + "norm2.weight"] = 1 + w(d, scale=0.05)
        sd[bp + "norm2.bias"] = w(d)
        sd[bp + "mlp.fc1.weight"] = w(cfg.vit_mlp_ratio * d, d)
        sd[bp + "mlp.fc1.bias"] = w(cfg.vit_mlp_ratio * d)
        sd[bp + "mlp.fc2.weight"] = w(d, cfg.vit_mlp_ratio * d)
        sd[bp + "mlp.fc2.bias"] = w(d)
    sd[v + "norm.weight"] = np.ones((d,), np.float32)  # unused by DPT hooks
    sd[v + "norm.bias"] = np.zeros((d,), np.float32)

    for n in (3, 4):
        ap = f"pretrained.act_postprocess{n}."
        sd[ap + "0.project.0.weight"] = w(d, 2 * d)
        sd[ap + "0.project.0.bias"] = w(d)
        nc = cfg.neck_channels[n - 1]
        sd[ap + "3.weight"] = w(nc, d, 1, 1)
        sd[ap + "3.bias"] = w(nc)
        if n == 4:
            sd[ap + "4.weight"] = w(nc, nc, 3, 3)
            sd[ap + "4.bias"] = w(nc)

    f_ = cfg.features
    for i, nc in enumerate(cfg.neck_channels, start=1):
        sd[f"scratch.layer{i}_rn.weight"] = w(f_, nc, 3, 3)
    for n in range(1, 5):
        rp = f"scratch.refinenet{n}."
        for unit in ("resConfUnit1", "resConfUnit2"):
            if n == 4 and unit == "resConfUnit1":
                pass  # refinenet4 has no skip input, but isl-org still creates the unit
            sd[rp + f"{unit}.conv1.weight"] = w(f_, f_, 3, 3)
            sd[rp + f"{unit}.conv1.bias"] = w(f_)
            sd[rp + f"{unit}.conv2.weight"] = w(f_, f_, 3, 3)
            sd[rp + f"{unit}.conv2.bias"] = w(f_)
        sd[rp + "out_conv.weight"] = w(f_, f_, 1, 1)
        sd[rp + "out_conv.bias"] = w(f_)
    sd["scratch.output_conv.0.weight"] = w(f_ // 2, f_, 3, 3)
    sd["scratch.output_conv.0.bias"] = w(f_ // 2)
    sd["scratch.output_conv.2.weight"] = w(32, f_ // 2, 3, 3)
    sd["scratch.output_conv.2.bias"] = w(32)
    sd["scratch.output_conv.4.weight"] = w(1, 32, 1, 1)
    sd["scratch.output_conv.4.bias"] = w(1)
    return sd


# --------------------------------------------------------------------- torch oracle
def _std_conv(x, w, stride=1):
    wf = w.float()
    mu = wf.mean(dim=(1, 2, 3), keepdim=True)
    var = wf.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
    wn = (wf - mu) * torch.rsqrt(var + 1e-8)
    # TF-SAME padding
    ih, iw = x.shape[-2:]
    kh, kw = w.shape[-2:]
    oh = -(-ih // stride)
    ph = max((oh - 1) * stride + kh - ih, 0)
    x = F.pad(x, (ph // 2, ph - ph // 2, ph // 2, ph - ph // 2))
    return F.conv2d(x, wn, stride=stride)


def _gn(sd, prefix, x, act=True):
    y = F.group_norm(x, 32 if x.shape[1] >= 32 else x.shape[1],
                     sd[prefix + ".weight"], sd[prefix + ".bias"], 1e-5)
    return F.relu(y) if act else y


def _torch_midas(sd_np, cfg: MidasConfig, x_nchw):
    sd = {k: torch.tensor(v) for k, v in sd_np.items()}
    p = "pretrained.model.patch_embed.backbone."
    x = torch.tensor(x_nchw)
    h = _std_conv(x, sd[p + "stem.conv.weight"], 2)
    h = _gn(sd, p + "stem.norm", h)
    ph = max(2 + 3 - 2, 0) if h.shape[-1] % 2 else max(3 - 2, 0)
    h = F.max_pool2d(F.pad(h, (ph // 2, ph - ph // 2, ph // 2, ph - ph // 2),
                           value=-torch.inf), 3, 2)
    outs = []
    width, in_ch = cfg.stem_width * 4, cfg.stem_width
    for si, n_blocks in enumerate(cfg.resnet_layers):
        for bi in range(n_blocks):
            bp = p + f"stages.{si}.blocks.{bi}."
            stride = 2 if (bi == 0 and si > 0) else 1
            if (bp + "downsample.conv.weight") in sd:
                sc = _std_conv(h, sd[bp + "downsample.conv.weight"], stride)
                sc = _gn(sd, bp + "downsample.norm", sc, act=False)
            else:
                sc = h
            y = _gn(sd, bp + "norm1", _std_conv(h, sd[bp + "conv1.weight"]))
            y = _gn(sd, bp + "norm2", _std_conv(y, sd[bp + "conv2.weight"], stride))
            y = _gn(sd, bp + "norm3", _std_conv(y, sd[bp + "conv3.weight"]), act=False)
            h = F.relu(y + sc)
        outs.append(h)
        width *= 2
    s0, s1, s2 = outs

    v = "pretrained.model."
    d = cfg.vit_dim
    t = F.conv2d(s2, sd[v + "patch_embed.proj.weight"], sd[v + "patch_embed.proj.bias"])
    b = t.shape[0]
    gh, gw = t.shape[2], t.shape[3]
    tokens = t.flatten(2).transpose(1, 2)
    cls = sd[v + "cls_token"].expand(b, 1, d)
    pos = sd[v + "pos_embed"]
    if pos.shape[1] != gh * gw + 1:
        # MiDaS vit.py forward_flex _resize_pos_embed: bilinear resample of the grid
        gs_old = int(round(float((pos.shape[1] - 1) ** 0.5)))
        grid = pos[:, 1:].reshape(1, gs_old, gs_old, d).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=(gh, gw), mode="bilinear", align_corners=False)
        pos = torch.cat([pos[:, :1], grid.flatten(2).transpose(1, 2)], dim=1)
    tokens = torch.cat([cls, tokens], dim=1) + pos
    hooks = []
    heads = cfg.vit_heads
    for i in range(cfg.vit_depth):
        bp = v + f"blocks.{i}."
        hgt = F.layer_norm(tokens, (d,), sd[bp + "norm1.weight"], sd[bp + "norm1.bias"],
                           1e-6)
        qkv = hgt @ sd[bp + "attn.qkv.weight"].T + sd[bp + "attn.qkv.bias"]
        q, k, vv = qkv.reshape(b, -1, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
        attn = torch.softmax(q @ k.transpose(-1, -2) * (d // heads) ** -0.5, dim=-1)
        o = (attn @ vv).transpose(1, 2).reshape(b, -1, d)
        tokens = tokens + o @ sd[bp + "attn.proj.weight"].T + sd[bp + "attn.proj.bias"]
        hgt = F.layer_norm(tokens, (d,), sd[bp + "norm2.weight"], sd[bp + "norm2.bias"],
                           1e-6)
        hgt = F.gelu(hgt @ sd[bp + "mlp.fc1.weight"].T + sd[bp + "mlp.fc1.bias"])
        tokens = tokens + hgt @ sd[bp + "mlp.fc2.weight"].T + sd[bp + "mlp.fc2.bias"]
        if i in cfg.hooks:
            hooks.append(tokens)

    def readout(tk, n):
        ap = f"pretrained.act_postprocess{n}."
        clsr = tk[:, :1].expand_as(tk[:, 1:])
        y = torch.cat([tk[:, 1:], clsr], dim=-1)
        y = F.gelu(y @ sd[ap + "0.project.0.weight"].T + sd[ap + "0.project.0.bias"])
        y = y.transpose(1, 2).reshape(b, d, gh, gw)
        y = F.conv2d(y, sd[ap + "3.weight"], sd[ap + "3.bias"])
        if n == 4:
            y = F.conv2d(y, sd[ap + "4.weight"], sd[ap + "4.bias"], stride=2, padding=1)
        return y

    l3, l4 = readout(hooks[0], 3), readout(hooks[1], 4)
    rn = [F.conv2d(t_, sd[f"scratch.layer{i}_rn.weight"], padding=1)
          for i, t_ in enumerate([s0, s1, l3, l4], start=1)]

    def rcu(xx, prefix):
        y = F.conv2d(F.relu(xx), sd[prefix + ".conv1.weight"], sd[prefix + ".conv1.bias"],
                     padding=1)
        y = F.conv2d(F.relu(y), sd[prefix + ".conv2.weight"], sd[prefix + ".conv2.bias"],
                     padding=1)
        return y + xx

    def fusion(n, xx, skip=None):
        rp = f"scratch.refinenet{n}."
        if skip is not None:
            xx = xx + rcu(skip, rp + "resConfUnit1")
        xx = rcu(xx, rp + "resConfUnit2")
        xx = F.interpolate(xx, scale_factor=2, mode="bilinear", align_corners=True)
        return F.conv2d(xx, sd[rp + "out_conv.weight"], sd[rp + "out_conv.bias"])

    p4 = fusion(4, rn[3])
    p3 = fusion(3, p4, rn[2])
    p2 = fusion(2, p3, rn[1])
    p1 = fusion(1, p2, rn[0])
    y = F.conv2d(p1, sd["scratch.output_conv.0.weight"], sd["scratch.output_conv.0.bias"],
                 padding=1)
    y = F.interpolate(y, scale_factor=2, mode="bilinear", align_corners=True)
    y = F.relu(F.conv2d(y, sd["scratch.output_conv.2.weight"],
                        sd["scratch.output_conv.2.bias"], padding=1))
    y = F.relu(F.conv2d(y, sd["scratch.output_conv.4.weight"],
                        sd["scratch.output_conv.4.bias"]))
    return y[:, 0]


class TestMidas:
    def test_matches_torch_oracle(self):
        sd = _synthetic_sd(CFG)
        model = DPTHybridDepth(CFG)
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                  jnp.zeros((1, CFG.image_size, CFG.image_size, 3)))
        params = port_midas(sd, template, strict=True)

        rng = np.random.default_rng(1)
        x = (rng.uniform(size=(1, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
             - 0.5) / 0.5
        got = np.asarray(model.apply(params, jnp.asarray(x)))
        want = _torch_midas(sd, CFG, x.transpose(0, 3, 1, 2)).numpy()
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-2)  # outputs O(300) w/ random weights

    def test_full_config_shapes(self):
        """Full dpt_hybrid geometry: pos_embed 577 tokens, /16 grid, output at input
        resolution."""
        cfg = MidasConfig()
        model = DPTHybridDepth(cfg)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 384, 384, 3)))
        flat = {"/".join(str(getattr(p, "key", p)) for p in path): leaf.shape
                for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]}
        assert flat["params/pos_embed"] == (1, 577, 768)
        assert flat["params/backbone/stages_2_blocks_8/conv3/kernel"][-1] == 1024
        out = jax.eval_shape(
            lambda p: DPTHybridDepth(cfg).apply(p, jnp.zeros((1, 384, 384, 3))), shapes)
        assert out.shape == (1, 384, 384)

    def test_forward_flex_nonsquare_matches_torch(self):
        """Aspect-preserving inputs (ADVICE r3): a non-native non-square multiple-of-32
        input resamples the pos_embed (MiDaS forward_flex) — must match the torch
        transcription running the same F.interpolate resample."""
        sd = _synthetic_sd(CFG)
        model = DPTHybridDepth(CFG)
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                  jnp.zeros((1, CFG.image_size, CFG.image_size, 3)))
        params = port_midas(sd, template, strict=True)

        h, w = CFG.image_size + 32, CFG.image_size - 32  # non-square, /32
        rng = np.random.default_rng(5)
        x = (rng.uniform(size=(1, h, w, 3)).astype(np.float32) - 0.5) / 0.5
        got = np.asarray(model.apply(params, jnp.asarray(x)))
        want = _torch_midas(sd, CFG, x.transpose(0, 3, 1, 2)).numpy()
        assert got.shape == want.shape == (1, h, w)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-2)

    def test_midas_resize_shape(self):
        """midas_resize_shape reproduces the isl-org Resize('minimal', multiple-of-32)
        arithmetic used by controlnet_aux MidasDetector."""
        from lkgd_tpu.models.midas import midas_resize_shape

        # landscape 480x640: height scale 0.8 is closer to 1 than width 0.6
        assert midas_resize_shape(480, 640) == (384, 512)
        # portrait mirrors
        assert midas_resize_shape(640, 480) == (512, 384)
        # native square is a fixed point
        assert midas_resize_shape(384, 384) == (384, 384)
        # lower_bound: both sides >= 384
        assert midas_resize_shape(480, 640, method="lower_bound") == (384, 512)
        assert midas_resize_shape(640, 480, method="lower_bound") == (512, 384)
        # never collapses below one multiple
        assert midas_resize_shape(16, 16) == (384, 384)

    def test_porter_strict_coverage(self):
        """Dropping any tensor must fail strict porting (the naming audit)."""
        sd = _synthetic_sd(CFG)
        model = DPTHybridDepth(CFG)
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                  jnp.zeros((1, CFG.image_size, CFG.image_size, 3)))
        sd2 = dict(sd)
        sd2.pop("scratch.refinenet2.out_conv.weight")
        with pytest.raises(ValueError):
            port_midas(sd2, template, strict=True)
