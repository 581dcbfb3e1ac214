"""RIFE IFNet: parity vs a torch ground-truth mirror + interpolation API."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.rife import (IFNet, RIFEConfig, interpolate_video,
                                  make_rife_doubler, pad_to_multiple, rife_warp)
from lkgd_tpu.utils.porting import port_rife


def _build_torch_ifnet(c):
    """Ground-truth torch IFNet (v3-HD architecture) for parity checking."""
    torch = pytest.importorskip("torch")
    nn, F = torch.nn, torch.nn.functional

    def pconv(i, o, s=1):
        return nn.Sequential(nn.Conv2d(i, o, 3, s, 1), nn.PReLU(o))

    class TBlock(nn.Module):
        def __init__(self, inp):
            super().__init__()
            self.conv0 = nn.Sequential(pconv(inp, c // 2, 2), pconv(c // 2, c, 2))
            for i in range(4):
                setattr(self, f"convblock{i}", nn.Sequential(pconv(c, c), pconv(c, c)))
            self.conv1 = nn.Sequential(nn.ConvTranspose2d(c, c // 2, 4, 2, 1),
                                       nn.PReLU(c // 2),
                                       nn.ConvTranspose2d(c // 2, 4, 4, 2, 1))
            self.conv2 = nn.Sequential(nn.ConvTranspose2d(c, c // 2, 4, 2, 1),
                                       nn.PReLU(c // 2),
                                       nn.ConvTranspose2d(c // 2, 1, 4, 2, 1))

        def forward(self, x, flow, scale):
            x = F.interpolate(x, scale_factor=1 / scale, mode="bilinear",
                              align_corners=False)
            flow = F.interpolate(flow, scale_factor=1 / scale, mode="bilinear",
                                 align_corners=False) / scale
            feat = self.conv0(torch.cat((x, flow), 1))
            for i in range(4):
                feat = getattr(self, f"convblock{i}")(feat) + feat
            f = self.conv1(feat)
            m = self.conv2(feat)
            f = F.interpolate(f, scale_factor=scale, mode="bilinear",
                              align_corners=False) * scale
            m = F.interpolate(m, scale_factor=scale, mode="bilinear",
                              align_corners=False)
            return f, m

    def twarp(img, flow):
        b, _, h, w = img.shape
        gy, gx = torch.meshgrid(torch.arange(h).float(), torch.arange(w).float(),
                                indexing="ij")
        coords = torch.stack([gx, gy])[None] + flow
        norm = torch.tensor([(w - 1) / 2, (h - 1) / 2]).view(1, 2, 1, 1)
        grid = ((coords - norm) / norm).permute(0, 2, 3, 1)
        return F.grid_sample(img, grid, mode="bilinear", padding_mode="zeros",
                             align_corners=True)

    class TNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.block0 = TBlock(7 + 4)
            self.block1 = TBlock(7 + 4)
            self.block2 = TBlock(7 + 4)

        def forward(self, img0, img1, scale_list=(4, 2, 1)):
            flow = torch.zeros(img0.shape[0], 4, *img0.shape[2:])
            mask = torch.zeros(img0.shape[0], 1, *img0.shape[2:])
            w0, w1 = img0, img1
            for i, s in enumerate(scale_list):
                blk = getattr(self, f"block{i}")
                f0, m0 = blk(torch.cat((w0, w1, mask), 1), flow, s)
                f1, m1 = blk(torch.cat((w1, w0, -mask), 1),
                             torch.cat((flow[:, 2:4], flow[:, :2]), 1), s)
                flow = flow + (f0 + torch.cat((f1[:, 2:4], f1[:, :2]), 1)) / 2
                mask = mask + (m0 + (-m1)) / 2
                w0 = twarp(img0, flow[:, :2])
                w1 = twarp(img1, flow[:, 2:4])
            m = torch.sigmoid(mask)
            return w0 * m + w1 * (1 - m)

    torch.manual_seed(0)
    return TNet()


class TestRIFEParity:
    @pytest.mark.slow
    def test_ifnet_matches_torch_with_ported_weights(self):
        torch = pytest.importorskip("torch")
        c = 16
        tnet = _build_torch_ifnet(c)
        model = IFNet(RIFEConfig(c=c))
        rng = np.random.default_rng(0)
        i0 = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        i1 = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        template = model.init(jax.random.PRNGKey(0), jnp.asarray(i0), jnp.asarray(i1))
        sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
        params = port_rife(sd, template, strict=True)
        got = np.asarray(model.apply(params, jnp.asarray(i0), jnp.asarray(i1)))
        with torch.no_grad():
            want = tnet(torch.tensor(i0.transpose(0, 3, 1, 2)),
                        torch.tensor(i1.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1), atol=2e-4)

    def test_port_drops_teacher_block(self):
        c = 16
        model = IFNet(RIFEConfig(c=c))
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                              jnp.zeros((1, 32, 32, 3)))
        tnet = _build_torch_ifnet(c)
        sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
        sd["block_tea.conv0.0.0.weight"] = np.zeros((c // 2, 14, 3, 3), np.float32)
        port_rife(sd, template, strict=True)  # teacher key silently dropped


class TestInterpolationAPI:
    def test_doubling_preserves_originals(self):
        model = IFNet(RIFEConfig(c=8))
        frames = jnp.asarray(np.random.default_rng(1)
                             .uniform(size=(4, 32, 32, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), frames[:1], frames[:1])
        out = interpolate_video(model, params, frames, exp=1)
        assert out.shape == (7, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(out[0::2]), np.asarray(frames), atol=1e-6)
        out2 = interpolate_video(model, params, frames, exp=2)
        assert out2.shape == (13, 32, 32, 3)

    def test_pad_and_crop_roundtrip(self):
        model = IFNet(RIFEConfig(c=8))
        frames = jnp.asarray(np.random.default_rng(2)
                             .uniform(size=(3, 30, 44, 3)).astype(np.float32))
        padded, hw = pad_to_multiple(frames)
        assert padded.shape == (3, 32, 64, 3) and hw == (30, 44)
        params = model.init(jax.random.PRNGKey(0), padded[:1], padded[:1])
        out = interpolate_video(model, params, frames, exp=1)
        assert out.shape == (5, 30, 44, 3)

    def test_dedup_threshold_copies_static_frames(self):
        model = IFNet(RIFEConfig(c=8))
        f = np.random.default_rng(3).uniform(size=(32, 32, 3)).astype(np.float32)
        frames = jnp.asarray(np.stack([f, f, f + 0.5]))  # first pair static
        params = model.init(jax.random.PRNGKey(0), frames[:1], frames[:1])
        out = np.asarray(interpolate_video(model, params, frames, exp=1,
                                           dedup_threshold=1e-4))
        np.testing.assert_allclose(out[1], out[0], atol=1e-6)
