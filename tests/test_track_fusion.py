"""patch_FSM track-scatter fusion: torch oracle replicating the reference gather /
scatter_add / visibility-average semantics (patch_FSM.py:386-443), zero-init identity,
and the UNet2D integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from lkgd_tpu.ops.track_fusion import quantize_tracks, track_scatter_fusion


def _torch_oracle(hidden, src_idx, dst_idx, vis, conv_w, conv_b, feat_h, feat_w):
    """Direct transcription of the reference block semantics (torch, CPU)."""
    h = torch.tensor(hidden)
    src_feats, dst_feats = h[::2].clone(), h[1::2].clone()
    B, N, C = src_feats.shape
    si = torch.tensor(src_idx, dtype=torch.int64)
    di = torch.tensor(dst_idx, dtype=torch.int64)
    pv = torch.tensor(vis, dtype=h.dtype).unsqueeze(-1).expand(B, -1, C)
    invis = pv == 0

    gathered = torch.gather(dst_feats, 1, di.unsqueeze(-1).expand(B, -1, C)).clone()
    gathered[invis] = 0
    canvas = torch.zeros_like(src_feats)
    ssrc = torch.scatter_add(canvas, 1, si.unsqueeze(-1).expand(B, -1, C), gathered)
    vsrc = torch.scatter_add(canvas, 1, si.unsqueeze(-1).expand(B, -1, C), pv)
    aligned = ssrc / (vsrc + 1e-6)

    cat = torch.cat([src_feats, aligned], -1)
    cat = cat.reshape(B, feat_h, feat_w, 2 * C).permute(0, 3, 1, 2)
    fused = torch.nn.functional.conv2d(cat, torch.tensor(conv_w), torch.tensor(conv_b),
                                       padding=1)
    fused = fused.permute(0, 2, 3, 1).reshape(B, N, 2 * C)
    src_fused, dst_scat = fused.chunk(2, -1)

    regathered = torch.gather(dst_scat, 1, si.unsqueeze(-1).expand(B, -1, C)).clone()
    regathered[invis] = 0
    canvas = torch.zeros_like(dst_feats)
    sdst = torch.scatter_add(canvas, 1, di.unsqueeze(-1).expand(B, -1, C), regathered)
    vdst = torch.scatter_add(canvas, 1, di.unsqueeze(-1).expand(B, -1, C), pv)
    dst_add = sdst / (vdst + 1e-6)

    out = torch.stack([src_feats + src_fused, dst_feats + dst_add], 1)
    return out.reshape(hidden.shape).numpy()


def test_matches_torch_oracle():
    rng = np.random.default_rng(0)
    B, fh, fw, C, Nt = 2, 4, 6, 8, 10
    N = fh * fw
    hidden = rng.standard_normal((2 * B, N, C)).astype(np.float32)
    src_idx = rng.integers(0, N, (B, Nt)).astype(np.int32)
    dst_idx = rng.integers(0, N, (B, Nt)).astype(np.int32)
    vis = (rng.random((B, Nt)) > 0.3).astype(np.float32)
    conv_w = (rng.standard_normal((2 * C, 2 * C, 3, 3)) * 0.1).astype(np.float32)
    conv_b = (rng.standard_normal(2 * C) * 0.1).astype(np.float32)

    def conv(x):  # NHWC conv with the torch OIHW weights
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(conv_w.transpose(2, 3, 1, 0)), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + jnp.asarray(conv_b)

    got = track_scatter_fusion(jnp.asarray(hidden), jnp.asarray(src_idx),
                               jnp.asarray(dst_idx), jnp.asarray(vis), conv, fh, fw)
    want = _torch_oracle(hidden, src_idx, dst_idx, vis, conv_w, conv_b, fh, fw)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_quantize_tracks():
    src = jnp.asarray([[[15.0, 7.0], [0.0, 0.0]]])  # (1, 2, 2) xy
    dst = jnp.asarray([[[63.9, 31.9], [8.0, 8.0]]])
    si, di = quantize_tracks(src, dst, feat_h=4, feat_w=8, downsample=8.0)
    np.testing.assert_array_equal(np.asarray(si), [[1 + 0 * 8, 0]])
    np.testing.assert_array_equal(np.asarray(di), [[7 + 3 * 8, 1 + 1 * 8]])


def test_unet2d_track_fusion_zero_init_and_grads():
    """Zero-init conv_fuse -> fusion is an exact no-op at init; params include
    conv_fuse; forward with tracks works end to end."""
    from lkgd_tpu.models.unet_2d import UNet2DCondition, UNet2DConfig

    cfg = UNet2DConfig(block_out_channels=(32, 64),
                       down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                       up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                       layers_per_block=1, num_attention_heads=(2, 4),
                       cross_attention_dim=32, track_fusion=True)
    unet = UNet2DCondition(cfg)
    rng = np.random.default_rng(1)
    B, H, W = 2, 16, 16  # paired batch: 1 src + 1 dst
    x = jnp.asarray(rng.standard_normal((2 * 1, H, W, 4)), jnp.float32)
    ehs = jnp.asarray(rng.standard_normal((2, 4, 32)), jnp.float32)
    tracks = (jnp.asarray(rng.uniform(0, W, (1, 6, 2)), jnp.float32),
              jnp.asarray(rng.uniform(0, W, (1, 6, 2)), jnp.float32),
              jnp.ones((1, 6), jnp.float32))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros(()), ehs, tracks=tracks)
    flat = {"/".join(str(getattr(k, "key", k)) for k in p)
            for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert any("conv_fuse" in p for p in flat)

    out_tracks = unet.apply(params, x, jnp.zeros(()), ehs, tracks=tracks)
    out_plain = unet.apply(params, x, jnp.zeros(()), ehs)
    # conv_fuse is zero-init: src stream unchanged; dst stream only via the (zero)
    # routed features -> identical output
    np.testing.assert_allclose(np.asarray(out_tracks), np.asarray(out_plain),
                               rtol=1e-6, atol=1e-6)
