"""Lineart-anime (Anime2Sketch pix2pix U-Net) vs an inline torch oracle.

The oracle below re-implements the exact ``UnetGenerator`` the reference's
``lineart_anime`` preprocessor loads (controlnet_aux ``lineart_anime.py`` /
Anime2Sketch ``model.py``), so the porter is verified against the real state-dict
naming AND the real numerics (incl. torch ConvTranspose2d gradient-of-conv semantics).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from lkgd_tpu.models.lineart_anime import (
    LineartAnimeConfig, LineartAnimeGenerator, make_lineart_anime_processor,
    port_lineart_anime)


class _TorchSkipBlock(tnn.Module):
    """pix2pix UnetSkipConnectionBlock with InstanceNorm2d(affine=False)."""

    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost = outermost
        if input_nc is None:
            input_nc = outer_nc
        norm = functools.partial(tnn.InstanceNorm2d, affine=False)
        downconv = tnn.Conv2d(input_nc, inner_nc, 4, stride=2, padding=1, bias=True)
        downrelu = tnn.LeakyReLU(0.2, True)
        uprelu = tnn.ReLU(True)
        if outermost:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, stride=2, padding=1)
            model = [downconv, submodule, uprelu, upconv, tnn.Tanh()]
        elif innermost:
            upconv = tnn.ConvTranspose2d(inner_nc, outer_nc, 4, stride=2, padding=1,
                                         bias=True)
            model = [downrelu, downconv, uprelu, upconv, norm(outer_nc)]
        else:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, stride=2, padding=1,
                                         bias=True)
            model = [downrelu, downconv, norm(inner_nc), submodule, uprelu, upconv,
                     norm(outer_nc)]
        self.model = tnn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


class _TorchUnetGenerator(tnn.Module):
    def __init__(self, input_nc=3, output_nc=1, num_downs=8, ngf=64):
        super().__init__()
        block = _TorchSkipBlock(ngf * 8, ngf * 8, innermost=True)
        for _ in range(num_downs - 5):
            block = _TorchSkipBlock(ngf * 8, ngf * 8, submodule=block)
        block = _TorchSkipBlock(ngf * 4, ngf * 8, submodule=block)
        block = _TorchSkipBlock(ngf * 2, ngf * 4, submodule=block)
        block = _TorchSkipBlock(ngf, ngf * 2, submodule=block)
        self.model = _TorchSkipBlock(output_nc, ngf, input_nc=input_nc, submodule=block,
                                     outermost=True)

    def forward(self, x):
        return self.model(x)


SMALL = LineartAnimeConfig(num_downs=6, ngf=8)


def _small_torch():
    torch.manual_seed(0)
    net = _TorchUnetGenerator(num_downs=SMALL.num_downs, ngf=SMALL.ngf)
    net.eval()
    return net


def test_port_matches_torch_oracle():
    net = _small_torch()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = port_lineart_anime(sd, SMALL)

    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    out = np.asarray(LineartAnimeGenerator(SMALL).apply(params, jnp.asarray(x)))
    assert out.shape == ref.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_full_size_port_keys_and_processor():
    # full-size key naming: synthesize a state dict with the exact pix2pix keys
    cfg = LineartAnimeConfig()  # num_downs=8, ngf=64
    net = _TorchUnetGenerator()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    # every conv/convT param consumed, none missing
    params = port_lineart_anime(sd, cfg)
    n_ported = sum(x.size for x in jax.tree.leaves(params))
    n_torch = sum(v.size for v in sd.values())
    assert n_ported == n_torch

    proc = make_lineart_anime_processor(port_lineart_anime(
        {k: v for k, v in _small_torch().state_dict().items()}, SMALL), SMALL)
    img = np.random.default_rng(1).uniform(size=(70, 90, 3)).astype(np.float32)
    out = proc(img)  # pads 70x90 up to the 64-multiple and crops back
    assert out.shape == (70, 90, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
