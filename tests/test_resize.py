"""Antialiased-resize parity vs. a torch oracle re-deriving the reference algorithm
(`pipeline_stable_video_diffusion_trans.py:661-765`: gaussian blur, reflect pad, bicubic
align_corners=True)."""

import numpy as np
import pytest
import jax.numpy as jnp

from lkgd_tpu.ops.resize import resize_with_antialiasing


def _torch_oracle(x_nchw, size):
    torch = pytest.importorskip("torch")
    t = torch.tensor(x_nchw)
    h, w = t.shape[-2:]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = [int(max(2.0 * 2 * s, 3)) for s in sigmas]
    ks = [k + 1 if k % 2 == 0 else k for k in ks]

    def gauss(n, sigma):
        xx = torch.arange(n, dtype=torch.float64) - n // 2
        if n % 2 == 0:
            xx = xx + 0.5
        g = torch.exp(-xx.pow(2) / (2 * sigma**2))
        return (g / g.sum()).to(t.dtype)

    kx = gauss(ks[1], sigmas[1])
    ky = gauss(ks[0], sigmas[0])
    # separable blur with reflect padding
    pad_x = (ks[1] // 2, ks[1] - 1 - ks[1] // 2)
    pad_y = (ks[0] // 2, ks[0] - 1 - ks[0] // 2)
    b, c = t.shape[:2]
    out = torch.nn.functional.pad(t, (pad_x[0], pad_x[1], 0, 0), mode="reflect")
    out = torch.nn.functional.conv2d(out, kx.view(1, 1, 1, -1).expand(c, 1, 1, -1), groups=c)
    out = torch.nn.functional.pad(out, (0, 0, pad_y[0], pad_y[1]), mode="reflect")
    out = torch.nn.functional.conv2d(out, ky.view(1, 1, -1, 1).expand(c, 1, -1, 1), groups=c)
    return torch.nn.functional.interpolate(out, size=size, mode="bicubic",
                                           align_corners=True).numpy()


@pytest.mark.parametrize("in_shape,size", [((1, 3, 64, 96), (32, 32)),
                                           ((2, 3, 48, 48), (24, 36))])
def test_matches_torch(in_shape, size):
    rng = np.random.default_rng(0)
    x = rng.normal(size=in_shape).astype(np.float32)
    want = _torch_oracle(x, size)
    got = resize_with_antialiasing(jnp.asarray(x.transpose(0, 2, 3, 1)), size)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_identity_when_same_size():
    x = jnp.ones((1, 8, 8, 3))
    assert resize_with_antialiasing(x, (8, 8)) is x


@pytest.mark.parametrize("in_shape,size", [((1, 3, 37, 37), (24, 24)),   # downscale
                                           ((2, 3, 16, 20), (34, 27))])  # upscale
def test_bicubic_half_pixel_matches_torch(in_shape, size):
    """bicubic_resize = torch F.interpolate(mode='bicubic', align_corners=False,
    antialias=False) — the HF Dinov2 interpolate_pos_encoding kernel (a=-0.75)."""
    import torch

    from lkgd_tpu.ops.resize import bicubic_resize

    rng = np.random.default_rng(1)
    x = rng.normal(size=in_shape).astype(np.float32)
    want = torch.nn.functional.interpolate(torch.from_numpy(x), size=size,
                                           mode="bicubic", align_corners=False).numpy()
    got = np.asarray(bicubic_resize(jnp.asarray(x.transpose(0, 2, 3, 1)), size))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)
