"""Lineart (Informative-Drawings) generator vs an independent torch transcription
(reference preprocessor `utils/controlnet_utils.py:118` via controlnet_aux)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.lineart import (LineartConfig, LineartGenerator, port_lineart)


def _random_sd(rng, cfg=LineartConfig()):
    ngf = cfg.ngf

    def conv(o, i, k):
        return (rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.1,
                rng.normal(size=(o,)).astype(np.float32) * 0.1)

    sd = {}
    for key, (o, i, k) in {
        "model0.1": (ngf, cfg.in_channels, 7),
        "model1.0": (ngf * 2, ngf, 3), "model1.3": (ngf * 4, ngf * 2, 3),
        "model4.1": (cfg.out_channels, ngf, 7),
    }.items():
        sd[f"{key}.weight"], sd[f"{key}.bias"] = conv(o, i, k)
    for j in range(cfg.n_residual_blocks):
        for idx in (1, 5):
            w, b = conv(ngf * 4, ngf * 4, 3)
            sd[f"model2.{j}.conv_block.{idx}.weight"] = w
            sd[f"model2.{j}.conv_block.{idx}.bias"] = b
    # ConvTranspose2d stores (in, out, kh, kw)
    for key, (i, o) in {"model3.0": (ngf * 4, ngf * 2), "model3.3": (ngf * 2, ngf)}.items():
        sd[f"{key}.weight"] = rng.normal(size=(i, o, 3, 3)).astype(np.float32) * 0.1
        sd[f"{key}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1
    return sd


def _torch_generator(sd, x_nchw, cfg=LineartConfig()):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = {k: torch.tensor(v) for k, v in sd.items()}

    def inorm(h):
        return F.instance_norm(h)

    def conv(h, key, pad=0, stride=1, reflect=0):
        if reflect:
            h = F.pad(h, (reflect,) * 4, mode="reflect")
        return F.conv2d(h, t[f"{key}.weight"], t[f"{key}.bias"], stride=stride,
                        padding=pad)

    h = F.relu(inorm(conv(torch.tensor(x_nchw), "model0.1", reflect=3)))
    h = F.relu(inorm(conv(h, "model1.0", pad=1, stride=2)))
    h = F.relu(inorm(conv(h, "model1.3", pad=1, stride=2)))
    for j in range(cfg.n_residual_blocks):
        r = F.relu(inorm(conv(h, f"model2.{j}.conv_block.1", reflect=1)))
        r = inorm(conv(r, f"model2.{j}.conv_block.5", reflect=1))
        h = h + r
    for key in ("model3.0", "model3.3"):
        h = F.conv_transpose2d(h, t[f"{key}.weight"], t[f"{key}.bias"], stride=2,
                               padding=1, output_padding=1)
        h = F.relu(inorm(h))
    h = conv(h, "model4.1", reflect=3)
    return torch.sigmoid(h)


class TestLineart:
    def test_matches_torch_oracle(self):
        pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        sd = _random_sd(rng)
        x = rng.uniform(size=(1, 32, 48, 3)).astype(np.float32)

        params = port_lineart(sd)
        got = np.asarray(LineartGenerator().apply(params, jnp.asarray(x)))
        want = _torch_generator(sd, x.transpose(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(got[..., 0], want[:, 0], rtol=1e-4, atol=1e-5)

    def test_shapes_and_range(self):
        model = LineartGenerator()
        x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 64, 64, 3)),
                        jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (1, 64, 64, 1)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def test_param_count(self):
        params = LineartGenerator().init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        n = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
        # 7x7 stem + 2 downs + 3 res blocks @256 + 2 ups + 7x7 head (InstanceNorm
        # affine-free): pinned against the Informative-Drawings Generator(3,1,3)
        assert n == 4_290_945, n
