"""DPT-large vs an independent plain-torch transcription of HF's
``DPTForDepthEstimation`` (tiny config), fed a synthetic state dict in EXACT
Intel/dpt-large naming through the strict porter.

This is the model behind the reference's actual depth preprocessor —
``transformers.pipeline('depth-estimation')`` at
`/root/reference/utils/controlnet_utils.py:103-117` (default model Intel/dpt-large) —
verifying both the architecture math (ViT-L hooks, 'project' readout, transposed-conv
reassembles, pre-act fusion, monocular head) and the HF key map / q-k-v fusion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from lkgd_tpu.models.midas import DPTLargeDepth, MidasConfig, port_dpt_large

CFG = MidasConfig.tiny_large()


def _synthetic_sd(cfg: MidasConfig, seed=0):
    """Random state dict with the exact HF DPTForDepthEstimation key names + layouts."""
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.2):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    d, ps = cfg.vit_dim, cfg.patch_size
    g = cfg.image_size // ps
    sd = {}
    e = "dpt.embeddings."
    sd[e + "cls_token"] = w(1, 1, d)
    sd[e + "position_embeddings"] = w(1, g * g + 1, d)
    sd[e + "patch_embeddings.projection.weight"] = w(d, 3, ps, ps)
    sd[e + "patch_embeddings.projection.bias"] = w(d)
    for i in range(cfg.vit_depth):
        lp = f"dpt.encoder.layer.{i}."
        sd[lp + "layernorm_before.weight"] = 1 + w(d, scale=0.05)
        sd[lp + "layernorm_before.bias"] = w(d)
        for n in ("query", "key", "value"):
            sd[lp + f"attention.attention.{n}.weight"] = w(d, d)
            sd[lp + f"attention.attention.{n}.bias"] = w(d)
        sd[lp + "attention.output.dense.weight"] = w(d, d)
        sd[lp + "attention.output.dense.bias"] = w(d)
        sd[lp + "layernorm_after.weight"] = 1 + w(d, scale=0.05)
        sd[lp + "layernorm_after.bias"] = w(d)
        sd[lp + "intermediate.dense.weight"] = w(cfg.vit_mlp_ratio * d, d)
        sd[lp + "intermediate.dense.bias"] = w(cfg.vit_mlp_ratio * d)
        sd[lp + "output.dense.weight"] = w(d, cfg.vit_mlp_ratio * d)
        sd[lp + "output.dense.bias"] = w(d)
    sd["dpt.layernorm.weight"] = np.ones((d,), np.float32)  # bypassed by the hooks
    sd["dpt.layernorm.bias"] = np.zeros((d,), np.float32)

    nc, f = cfg.neck_channels, cfg.features
    for i in range(4):
        sd[f"neck.reassemble_stage.readout_projects.{i}.0.weight"] = w(d, 2 * d)
        sd[f"neck.reassemble_stage.readout_projects.{i}.0.bias"] = w(d)
        sd[f"neck.reassemble_stage.layers.{i}.projection.weight"] = w(nc[i], d, 1, 1)
        sd[f"neck.reassemble_stage.layers.{i}.projection.bias"] = w(nc[i])
        sd[f"neck.convs.{i}.weight"] = w(f, nc[i], 3, 3)
    sd["neck.reassemble_stage.layers.0.resize.weight"] = w(nc[0], nc[0], 4, 4)
    sd["neck.reassemble_stage.layers.0.resize.bias"] = w(nc[0])
    sd["neck.reassemble_stage.layers.1.resize.weight"] = w(nc[1], nc[1], 2, 2)
    sd["neck.reassemble_stage.layers.1.resize.bias"] = w(nc[1])
    sd["neck.reassemble_stage.layers.3.resize.weight"] = w(nc[3], nc[3], 3, 3)
    sd["neck.reassemble_stage.layers.3.resize.bias"] = w(nc[3])
    for i in range(4):
        fp = f"neck.fusion_stage.layers.{i}."
        sd[fp + "projection.weight"] = w(f, f, 1, 1)
        sd[fp + "projection.bias"] = w(f)
        for rl in ("residual_layer1", "residual_layer2"):
            for cv in ("convolution1", "convolution2"):
                sd[f"{fp}{rl}.{cv}.weight"] = w(f, f, 3, 3)
                sd[f"{fp}{rl}.{cv}.bias"] = w(f)
    sd["head.head.0.weight"] = w(f // 2, f, 3, 3)
    sd["head.head.0.bias"] = w(f // 2)
    sd["head.head.2.weight"] = w(32, f // 2, 3, 3)
    sd["head.head.2.bias"] = w(32)
    sd["head.head.4.weight"] = w(1, 32, 1, 1)
    sd["head.head.4.bias"] = w(1)
    return sd


def _t(a):
    return torch.from_numpy(np.ascontiguousarray(a))


def _up2_ac(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)


def _torch_dpt_large(sd_np, cfg: MidasConfig, x_nchw):
    """Independent transcription of transformers modeling_dpt forward (dpt-large)."""
    sd = {k: _t(v) for k, v in sd_np.items()}
    d, ps = cfg.vit_dim, cfg.patch_size
    g = cfg.image_size // ps
    eps = cfg.vit_ln_eps
    x = F.conv2d(_t(x_nchw), sd["dpt.embeddings.patch_embeddings.projection.weight"],
                 sd["dpt.embeddings.patch_embeddings.projection.bias"], stride=ps)
    b = x.shape[0]
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([sd["dpt.embeddings.cls_token"].expand(b, 1, d), x], dim=1)
    x = x + sd["dpt.embeddings.position_embeddings"]

    def ln(t, p):
        return F.layer_norm(t, (d,), sd[p + ".weight"], sd[p + ".bias"], eps)

    hooks = []
    hd = d // cfg.vit_heads
    for i in range(cfg.vit_depth):
        lp = f"dpt.encoder.layer.{i}"
        h = ln(x, lp + ".layernorm_before")
        q = h @ sd[lp + ".attention.attention.query.weight"].t() + sd[
            lp + ".attention.attention.query.bias"]
        k = h @ sd[lp + ".attention.attention.key.weight"].t() + sd[
            lp + ".attention.attention.key.bias"]
        v = h @ sd[lp + ".attention.attention.value.weight"].t() + sd[
            lp + ".attention.attention.value.bias"]
        s = h.shape[1]
        q = q.view(b, s, cfg.vit_heads, hd).transpose(1, 2)
        k = k.view(b, s, cfg.vit_heads, hd).transpose(1, 2)
        v = v.view(b, s, cfg.vit_heads, hd).transpose(1, 2)
        o = torch.softmax(q @ k.transpose(-1, -2) / hd ** 0.5, dim=-1) @ v
        o = o.transpose(1, 2).reshape(b, s, d)
        x = x + (o @ sd[lp + ".attention.output.dense.weight"].t()
                 + sd[lp + ".attention.output.dense.bias"])
        h = ln(x, lp + ".layernorm_after")
        h = F.gelu(h @ sd[lp + ".intermediate.dense.weight"].t()
                   + sd[lp + ".intermediate.dense.bias"], approximate="none")
        x = x + (h @ sd[lp + ".output.dense.weight"].t()
                 + sd[lp + ".output.dense.bias"])
        if i in cfg.hooks:
            hooks.append(x)

    def reassemble(t, i):
        cls = t[:, :1].expand_as(t[:, 1:])
        h = torch.cat([t[:, 1:], cls], dim=-1)
        rp = f"neck.reassemble_stage.readout_projects.{i}.0"
        h = F.gelu(h @ sd[rp + ".weight"].t() + sd[rp + ".bias"], approximate="none")
        h = h.view(b, g, g, d).permute(0, 3, 1, 2)
        pp = f"neck.reassemble_stage.layers.{i}.projection"
        h = F.conv2d(h, sd[pp + ".weight"], sd[pp + ".bias"])
        rz = f"neck.reassemble_stage.layers.{i}.resize"
        if i == 0:
            h = F.conv_transpose2d(h, sd[rz + ".weight"], sd[rz + ".bias"], stride=4)
        elif i == 1:
            h = F.conv_transpose2d(h, sd[rz + ".weight"], sd[rz + ".bias"], stride=2)
        elif i == 3:
            h = F.conv2d(h, sd[rz + ".weight"], sd[rz + ".bias"], stride=2, padding=1)
        return h

    rn = [F.conv2d(reassemble(hooks[i], i), sd[f"neck.convs.{i}.weight"], padding=1)
          for i in range(4)]

    def rcu(xx, prefix):
        h = F.conv2d(F.relu(xx), sd[prefix + ".convolution1.weight"],
                     sd[prefix + ".convolution1.bias"], padding=1)
        h = F.conv2d(F.relu(h), sd[prefix + ".convolution2.weight"],
                     sd[prefix + ".convolution2.bias"], padding=1)
        return h + xx

    def fusion(layer_idx, xx, skip=None):
        fp = f"neck.fusion_stage.layers.{layer_idx}"
        if skip is not None:
            xx = xx + rcu(skip, fp + ".residual_layer1")
        xx = rcu(xx, fp + ".residual_layer2")
        xx = _up2_ac(xx)
        return F.conv2d(xx, sd[fp + ".projection.weight"], sd[fp + ".projection.bias"])

    p4 = fusion(0, rn[3])
    p3 = fusion(1, p4, rn[2])
    p2 = fusion(2, p3, rn[1])
    p1 = fusion(3, p2, rn[0])

    h = F.conv2d(p1, sd["head.head.0.weight"], sd["head.head.0.bias"], padding=1)
    h = _up2_ac(h)
    h = F.relu(F.conv2d(h, sd["head.head.2.weight"], sd["head.head.2.bias"], padding=1))
    h = F.relu(F.conv2d(h, sd["head.head.4.weight"], sd["head.head.4.bias"]))
    return h[:, 0]


class TestDPTLarge:
    def test_matches_torch_oracle(self):
        sd = _synthetic_sd(CFG)
        model = DPTLargeDepth(CFG)
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                  jnp.zeros((1, CFG.image_size, CFG.image_size, 3)))
        params = port_dpt_large(sd, template)

        rng = np.random.default_rng(3)
        x = (rng.uniform(size=(2, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
             - 0.5) / 0.5
        got = np.asarray(model.apply(params, jnp.asarray(x)))
        want = _torch_dpt_large(sd, CFG, x.transpose(0, 3, 1, 2)).numpy()
        assert got.shape == want.shape == (2, CFG.image_size, CFG.image_size)
        # random tiny-config activations reach ~1e2, so pure fp32 reassociation noise
        # shows up at ~1e-3 absolute; 1e-3 still catches any wiring/layout bug
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_porter_strict_coverage(self):
        """Every checkpoint key consumed or deliberately skipped; every template leaf
        produced — a renamed/missing leaf fails loudly."""
        sd = _synthetic_sd(CFG)
        model = DPTLargeDepth(CFG)
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                  jnp.zeros((1, CFG.image_size, CFG.image_size, 3)))
        port_dpt_large(sd, template, strict=True)
        sd2 = dict(sd)
        sd2.pop("head.head.4.weight")
        with pytest.raises(ValueError):
            port_dpt_large(sd2, template, strict=True)

    @pytest.mark.slow
    def test_full_config_shapes(self):
        """Intel/dpt-large full config traces at 384^2 with the right param count
        (DPTForDepthEstimation dpt-large: ~343M params incl. the dead first-fusion
        residual_layer1 which we skip)."""
        cfg = MidasConfig.large()
        model = DPTLargeDepth(cfg)
        out, params = jax.eval_shape(
            lambda r: model.init_with_output(r, jnp.zeros((1, 384, 384, 3))),
            jax.random.PRNGKey(0))
        assert out.shape == (1, 384, 384)
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        assert 330e6 < n < 350e6, n
