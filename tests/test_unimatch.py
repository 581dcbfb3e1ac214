"""UniMatch flow estimator tests (helpers parity vs torch + tiny end-to-end)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.unimatch import (
    UniMatch, UniMatchConfig, bilinear_sample, coords_grid, flow_warp,
    global_correlation_softmax, upsample_flow_with_mask)


def test_bilinear_sample_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
    coords = rng.uniform(-1, 10, size=(2, 5, 7, 2)).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    tc = torch.tensor(coords)
    norm = torch.tensor([(10 - 1) / 2, (8 - 1) / 2])
    grid = (tc - norm) / norm
    want = torch.nn.functional.grid_sample(
        torch.tensor(img.transpose(0, 3, 1, 2)), grid, mode="bilinear",
        padding_mode="zeros", align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_convex_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    flow = rng.normal(size=(1, 4, 5, 2)).astype(np.float32)
    mask = rng.normal(size=(1, 4, 5, 9 * 16)).astype(np.float32)
    got = np.asarray(upsample_flow_with_mask(jnp.asarray(flow), jnp.asarray(mask), 4))
    tf = torch.tensor(flow.transpose(0, 3, 1, 2))
    tm = torch.tensor(mask.transpose(0, 3, 1, 2))
    b, fc, h, w = tf.shape
    m = tm.view(b, 1, 9, 4, 4, h, w).softmax(dim=2)
    uf = torch.nn.functional.unfold(4 * tf, [3, 3], padding=1).view(b, fc, 9, 1, 1, h, w)
    want = torch.sum(m * uf, dim=2).permute(0, 1, 4, 2, 5, 3).reshape(b, fc, 4 * h, 4 * w)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1), atol=5e-6)


def test_global_correlation_identity_flow():
    # identical features -> correspondence peaks on itself -> flow ~ 0 bias check
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.normal(size=(1, 6, 6, 16)).astype(np.float32)) * 10
    flow = global_correlation_softmax(f, f)
    assert float(jnp.abs(flow).max()) < 0.5


def test_flow_warp_identity():
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    out = flow_warp(f, jnp.zeros((1, 6, 6, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-5)


def test_unimatch_end_to_end_and_shift_sensitivity():
    model = UniMatch(UniMatchConfig.tiny())
    rng = np.random.default_rng(4)
    base = rng.uniform(0, 255, size=(40, 56, 3)).astype(np.float32)
    img0 = jnp.asarray(base[None, :32, :48])
    img1 = jnp.asarray(base[None, 4:36, :48])  # shifted down by 4 px
    params = model.init(jax.random.PRNGKey(0), img0, img1)
    flow = model.apply(params, img0, img1)
    assert flow.shape == (1, 32, 48, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_flow_wrapper():
    from lkgd_tpu.utils.optical_flow import make_flow_fn, make_bidirectional_flow_fn

    model = UniMatch(UniMatchConfig.tiny())
    frames = jnp.asarray(np.random.default_rng(5).uniform(size=(3, 30, 44, 3)).astype(np.float32))
    # init at the padded (multiple-of-16) resolution the wrapper actually feeds the model
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3)), jnp.zeros((1, 32, 48, 3)))
    fn = make_flow_fn(model, params, (30, 44))
    flow = fn(frames)
    assert flow.shape == (2, 30, 44, 2)
    fwd, bwd = make_bidirectional_flow_fn(model, params, (30, 44))(frames)
    assert fwd.shape == bwd.shape == (2, 30, 44, 2)


class TestStereoDepthTasks:
    """Reference unimatch supports task='stereo'/'depth' with shared weights
    (unimatch.py:95-361); these exercise the TPU re-implementation."""

    def test_global_stereo_recovers_known_disparity(self):
        from lkgd_tpu.models.unimatch import global_correlation_softmax_stereo

        rng = np.random.default_rng(7)
        k = 3  # true disparity
        left = rng.normal(size=(1, 4, 24, 16)).astype(np.float32) * 10
        right = np.zeros_like(left)
        right[:, :, : 24 - k] = left[:, :, k:]  # right view shifted left by k px
        disp = np.asarray(global_correlation_softmax_stereo(
            jnp.asarray(left), jnp.asarray(right)))
        assert disp.shape == (1, 4, 24, 1)
        assert (disp >= -1e-3).all()  # positivity from the triangular mask
        np.testing.assert_allclose(disp[0, :, k + 2: 24 - k - 2, 0], k, atol=0.1)

    def test_local_stereo_recovers_known_disparity(self):
        from lkgd_tpu.models.unimatch import local_correlation_softmax_stereo

        rng = np.random.default_rng(8)
        k = 2
        left = rng.normal(size=(1, 4, 20, 16)).astype(np.float32) * 10
        right = np.zeros_like(left)
        right[:, :, : 20 - k] = left[:, :, k:]
        disp = np.asarray(local_correlation_softmax_stereo(
            jnp.asarray(left), jnp.asarray(right), radius=4))
        np.testing.assert_allclose(disp[0, :, k + 4: 20 - k - 4, 0], k, atol=0.1)

    def test_depth_plane_sweep_recovers_known_inverse_depth(self):
        from lkgd_tpu.models.unimatch import correlation_softmax_depth

        rng = np.random.default_rng(9)
        fx = 16.0
        inv_z = 0.5  # true inverse depth -> x shift = fx * tx * inv_z = 8 px
        shift = int(fx * 1.0 * inv_z)
        f0 = rng.normal(size=(1, 6, 32, 16)).astype(np.float32) * 10
        f1 = np.zeros_like(f0)
        f1[:, :, shift:] = f0[:, :, : 32 - shift]  # target view shifted right
        K = jnp.asarray([[[fx, 0, 16.0], [0, fx, 3.0], [0, 0, 1.0]]])
        pose = jnp.eye(4)[None].at[0, 0, 3].set(1.0)  # translate +x
        cands = jnp.broadcast_to(
            jnp.linspace(2.0, 0.1, 64).reshape(1, -1, 1, 1), (1, 64, 6, 32))
        inv = np.asarray(correlation_softmax_depth(
            jnp.asarray(f0), jnp.asarray(f1), K, pose, cands))
        assert inv.shape == (1, 6, 32, 1)
        # random features can produce isolated accidental matches; require the bulk
        err = np.abs(inv[0, :, 4: 32 - shift - 4, 0] - inv_z)
        assert (err < 0.05).mean() > 0.95, err.max()
        assert np.median(err) < 0.02

    def test_rigid_flow_from_depth_pose(self):
        from lkgd_tpu.models.unimatch import compute_flow_with_depth_pose

        fx = 16.0
        K = jnp.asarray([[[fx, 0, 8.0], [0, fx, 4.0], [0, 0, 1.0]]])
        pose = jnp.eye(4)[None].at[0, 0, 3].set(1.0)
        depth = jnp.full((1, 8, 16), 2.0)
        flow = np.asarray(compute_flow_with_depth_pose(depth, K, pose))
        np.testing.assert_allclose(flow[..., 0], fx * 1.0 / 2.0, atol=1e-4)
        np.testing.assert_allclose(flow[..., 1], 0.0, atol=1e-4)

    def test_stereo_end_to_end_tiny(self):
        model = UniMatch(UniMatchConfig.tiny())
        rng = np.random.default_rng(10)
        img0 = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 48, 3)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 48, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), img0, img1, task="stereo")
        disp = model.apply(params, img0, img1, task="stereo")
        assert disp.shape == (1, 32, 48)
        arr = np.asarray(disp)
        assert np.isfinite(arr).all()
        assert (arr >= -1e-3).all()

    def test_depth_end_to_end_tiny(self):
        import dataclasses as dc

        # single-scale features come out at 1/8 resolution -> upsample_factor 8
        cfg = dc.replace(UniMatchConfig.tiny(), num_scales=1, upsample_factor=8,
                         attn_splits_list=(2,), corr_radius_list=(-1,),
                         prop_radius_list=(-1,))
        model = UniMatch(cfg)
        rng = np.random.default_rng(11)
        img0 = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 48, 3)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 48, 3)).astype(np.float32))
        K = jnp.asarray([[[40.0, 0, 24.0], [0, 40.0, 16.0], [0, 0, 1.0]]])
        pose = jnp.eye(4)[None].at[0, 0, 3].set(0.2)
        kw = dict(task="depth", intrinsics=K, pose=pose, num_depth_candidates=16)
        params = model.init(jax.random.PRNGKey(0), img0, img1, **kw)
        depth = model.apply(params, img0, img1, **kw)
        assert depth.shape == (1, 32, 48)
        arr = np.asarray(depth)
        assert np.isfinite(arr).all()
        assert (arr >= 0.5 - 1e-3).all() and (arr <= 10.0 + 1e-3).all()
