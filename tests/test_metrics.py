"""Metric harness tests."""

import numpy as np
import jax
import jax.numpy as jnp

from lkgd_tpu.eval.metrics import (
    AestheticMLP, align_depth_least_square, clip_score, depth_metrics, fid_from_features,
    frechet_distance, psnr, ssim)


def test_psnr_ssim():
    a = jnp.ones((1, 8, 8, 3)) * 0.5
    assert float(psnr(a, a)) > 60
    assert abs(float(ssim(a, a)) - 1.0) < 1e-5
    b = a + 0.1
    assert float(psnr(a, b)) < 25


def test_frechet_zero_for_same_distribution():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 8))
    assert frechet_distance(x, x) < 1e-6
    y = rng.normal(loc=3.0, size=(2000, 8))
    d = frechet_distance(x, y)
    assert abs(d - 8 * 9) < 8  # ||mu||^2 = 8*9, covs equal

    assert fid_from_features(x, y) == d


def test_clip_score_range():
    rng = np.random.default_rng(1)
    e = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    assert abs(float(clip_score(e, e)) - 100.0) < 1e-3
    assert float(clip_score(e, -e)) == 0.0


def test_aesthetic_mlp():
    params = AestheticMLP.init(jax.random.PRNGKey(0), in_dim=32)
    out = AestheticMLP.apply(params, jnp.ones((3, 32)))
    assert out.shape == (3,)


def test_depth_alignment_recovers_affine():
    rng = np.random.default_rng(2)
    gt = jnp.asarray(rng.uniform(1, 10, size=(2, 16, 16)).astype(np.float32))
    pred = gt * 0.5 + 3.0  # affine-distorted prediction
    aligned, scale, shift = align_depth_least_square(pred, gt)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(gt), rtol=1e-4, atol=1e-4)
    m = depth_metrics(pred, gt, align=True)
    assert m["abs_rel"] < 1e-4 and m["delta1"] > 0.999
