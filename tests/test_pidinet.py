"""PidiNet vs an independent plain-torch transcription computing the RAW pixel-
difference ops from their definitions (no conversion), fed a synthetic state dict in
exact table5_pidinet naming through the strict porter.

This validates BOTH the converted-conv architecture (our TPU runtime form) and the
cd/ad/rd kernel-conversion algebra: the torch side computes central difference as
conv(x, w) - conv(x, sum(w)) on the center, angular difference against the clockwise-
rotated neighbor, and radial difference as the radius-2 minus radius-1 shifted sums —
the paper definitions — while the JAX side runs only plain convs.

Reference annotator: ``softedge_pidsafe`` default at
`/root/reference/utils/controlnet_utils.py:99-101` via controlnet_aux PidiNetDetector."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from lkgd_tpu.models.pidinet import CARV4, PiDiNet, port_pidinet

INPLANE, DIL = 12, 8  # tiny config (real: 60, 24) — same topology


def _synthetic_sd(seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.3):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    c, c2, c4 = INPLANE, 2 * INPLANE, 4 * INPLANE
    sd = {"init_block.weight": w(c, 3, 3, 3)}
    chans = {1: (c, c), 2: (c, c2), 3: (c2, c4), 4: (c4, c4)}
    for st in (1, 2, 3, 4):
        ci, co = chans[st]
        blocks = range(1, 4) if st == 1 else range(1, 5)
        for b in blocks:
            p = f"block{st}_{b}"
            first = b == 1 and st > 1
            cin = ci if first else co
            sd[p + ".conv1.weight"] = w(cin, 1, 3, 3)  # depthwise
            sd[p + ".conv2.weight"] = w(co, cin, 1, 1)
            if first:
                sd[p + ".shortcut.weight"] = w(co, cin, 1, 1)
                sd[p + ".shortcut.bias"] = w(co)
    planes = [c, c2, c4, c4]
    for i in range(4):
        sd[f"dilations.{i}.conv1.weight"] = w(DIL, planes[i], 1, 1)
        sd[f"dilations.{i}.conv1.bias"] = w(DIL)
        for d in range(1, 5):
            sd[f"dilations.{i}.conv2_{d}.weight"] = w(DIL, DIL, 3, 3)
        sd[f"attentions.{i}.conv1.weight"] = w(4, DIL, 1, 1)
        sd[f"attentions.{i}.conv1.bias"] = w(4)
        sd[f"attentions.{i}.conv2.weight"] = w(1, 4, 3, 3)
        sd[f"conv_reduces.{i}.weight"] = w(1, DIL, 1, 1)
        sd[f"conv_reduces.{i}.bias"] = w(1)
    sd["classifier.weight"] = w(1, 4, 1, 1)
    sd["classifier.bias"] = w(1)
    return sd


def _t(a):
    return torch.from_numpy(np.ascontiguousarray(a))


def _pdc_conv(op, x, w, groups, stride=1):
    """RAW pixel-difference conv from the PDN paper definitions (pad 1)."""
    if op == "cv":
        return F.conv2d(x, w, padding=1, groups=groups, stride=stride)
    if op == "cd":
        center = F.conv2d(x, w.sum(dim=[2, 3], keepdim=True), groups=groups,
                          stride=stride)
        return F.conv2d(x, w, padding=1, groups=groups, stride=stride) - center
    if op == "ad":
        o, i = w.shape[:2]
        w_rot = w.view(o, i, 9)[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]].view(o, i, 3, 3)
        return F.conv2d(x, w, padding=1, groups=groups) - F.conv2d(
            x, w_rot, padding=1, groups=groups)
    if op == "rd":
        # y = sum_k w_k (x[2*off_k] - x[off_k]) over the 8 non-center taps
        o, i = w.shape[:2]
        xp = F.pad(x, (2, 2, 2, 2))
        h, ww_ = x.shape[-2:]
        out = 0.0
        taps = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
        flat = w.view(o, i, 9)
        for idx, (dy, dx) in enumerate(taps):
            k = idx if idx < 4 else idx + 1  # skip the center slot in the 3x3 layout
            wk = flat[:, :, k][..., None, None]  # (O, I, 1, 1)
            x2 = xp[:, :, 2 + 2 * dy:2 + 2 * dy + h, 2 + 2 * dx:2 + 2 * dx + ww_]
            x1 = xp[:, :, 2 + dy:2 + dy + h, 2 + dx:2 + dx + ww_]
            out = out + F.conv2d(x2 - x1, wk, groups=groups)
        return out
    raise ValueError(op)


def _torch_pidinet(sd_np, x_nchw):
    sd = {k: _t(v) for k, v in sd_np.items()}
    x = _t(x_nchw)
    h = _pdc_conv(CARV4[0], x, sd["init_block.weight"], groups=1, stride=2)
    # carv4 assigns ops sequentially: init, then the 15 block convs
    op_i = 1
    planes = []
    chans = {1: INPLANE, 2: 2 * INPLANE, 3: 4 * INPLANE, 4: 4 * INPLANE}
    for st in (1, 2, 3, 4):
        blocks = range(1, 4) if st == 1 else range(1, 5)
        for b in blocks:
            p = f"block{st}_{b}"
            first = b == 1 and st > 1
            op = CARV4[op_i]
            op_i += 1
            xin = h
            if first:
                xin = F.max_pool2d(xin, 2, 2)
            g = xin.shape[1]
            y = _pdc_conv(op, xin, sd[p + ".conv1.weight"], groups=g)
            y = F.conv2d(F.relu(y), sd[p + ".conv2.weight"])
            if first:
                xin = F.conv2d(xin, sd[p + ".shortcut.weight"], sd[p + ".shortcut.bias"])
            h = xin + y
        planes.append(h)

    hh, ww_ = x.shape[-2:]
    sides = []
    for i, p in enumerate(planes):
        e = F.conv2d(F.relu(p), sd[f"dilations.{i}.conv1.weight"],
                     sd[f"dilations.{i}.conv1.bias"])
        e = sum(F.conv2d(e, sd[f"dilations.{i}.conv2_{d}.weight"],
                         padding=2 * d + 3, dilation=2 * d + 3) for d in range(1, 5))
        a = F.conv2d(F.relu(e), sd[f"attentions.{i}.conv1.weight"],
                     sd[f"attentions.{i}.conv1.bias"])
        a = torch.sigmoid(F.conv2d(a, sd[f"attentions.{i}.conv2.weight"], padding=1))
        e = e * a
        e = F.conv2d(e, sd[f"conv_reduces.{i}.weight"], sd[f"conv_reduces.{i}.bias"])
        e = F.interpolate(e, (hh, ww_), mode="bilinear", align_corners=False)
        sides.append(e)
    fuse = F.conv2d(torch.cat(sides, dim=1), sd["classifier.weight"],
                    sd["classifier.bias"])
    return torch.sigmoid(fuse)[:, 0]


class TestPidinet:
    def test_matches_raw_pdc_torch_oracle(self):
        sd = _synthetic_sd()
        model = PiDiNet(inplane=INPLANE, dil=DIL)
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 3)))
        params = port_pidinet(sd, template)
        rng = np.random.default_rng(1)
        x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        got = np.asarray(model.apply(params, jnp.asarray(x)))
        want = _torch_pidinet(sd, x.transpose(0, 3, 1, 2)).numpy()
        assert got.shape == want.shape == (2, 32, 32)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_porter_strict(self):
        sd = _synthetic_sd()
        model = PiDiNet(inplane=INPLANE, dil=DIL)
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 3)))
        port_pidinet(sd, template, strict=True)
        bad = dict(sd)
        bad.pop("classifier.bias")
        with pytest.raises(ValueError):
            port_pidinet(bad, template, strict=True)

    def test_full_size_param_count(self):
        """table5_pidinet = ~710K params (pidinet paper table 5)."""
        model = PiDiNet()
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        assert 6e5 < n < 9e5, n
