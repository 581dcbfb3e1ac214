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
