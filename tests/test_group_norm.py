"""One-pass bandwidth-friendly GroupNorm vs. the two-pass torch-semantics oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lkgd_tpu.ops.group_norm import group_norm, reference_group_norm


@pytest.mark.parametrize("shape,groups", [
    ((3, 144, 320), 32),   # UNet spatial resblock (9x16 latent)
    ((2, 250, 64), 8),     # non-power-of-2 rows
    ((1, 2304, 640), 32),  # UNet level-2 spatial
])
@pytest.mark.parametrize("act", [None, "silu"])
def test_matches_reference(shape, groups, act):
    n, m, c = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 2.0 + 0.5, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    got = group_norm(x, scale, bias, num_groups=groups, eps=1e-5, act=act)
    want = reference_group_norm(x, scale, bias, num_groups=groups, eps=1e-5, act=act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_bf16_io():
    shape, groups = (2, 128, 64), 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    got = group_norm(x, scale, bias, num_groups=groups, eps=1e-5)
    assert got.dtype == jnp.bfloat16
    want = reference_group_norm(x.astype(jnp.float32), scale, bias, num_groups=groups,
                                eps=1e-5, act=None)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_grads_match_reference():
    shape, groups = (2, 64, 32), 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    scale = jnp.full((32,), 1.3, jnp.float32)
    bias = jnp.full((32,), -0.2, jnp.float32)

    def loss(fn):
        return lambda x, s, b: jnp.sum(
            fn(x, s, b, num_groups=groups, eps=1e-5, act="silu") ** 2)

    g_got = jax.grad(loss(group_norm), argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss(reference_group_norm), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_module_act_matches_separate_silu():
    """GroupNorm(act='silu') module == silu(GroupNorm()) with identical params."""
    from lkgd_tpu.models.layers import GroupNorm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 32)), jnp.float32)
    mod = GroupNorm(8, 1e-5, act="silu")
    params = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(params, x)
    want = jax.nn.silu(GroupNorm(8, 1e-5).apply(params, x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_matches_torch_groupnorm():
    import torch

    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, 7, 5, 64)).astype(np.float32)  # (N, H, W, C)
    scale = rng.normal(size=(64,)).astype(np.float32) * 0.2 + 1.0
    bias = rng.normal(size=(64,)).astype(np.float32) * 0.2
    gn = torch.nn.GroupNorm(8, 64, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        want = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = group_norm(jnp.asarray(x.reshape(3, 35, 64)), jnp.asarray(scale),
                     jnp.asarray(bias), num_groups=8, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape), want,
                               rtol=2e-4, atol=2e-4)


def test_pallas_path_matches_xla_interpret():
    from lkgd_tpu.ops.group_norm import _pallas_group_norm

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(3, 144, 320)) * 2 + 0.5, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(320,)) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(320,)) * 0.1, jnp.float32)
    got = _pallas_group_norm(x, scale, bias, num_groups=32, eps=1e-5, act="silu",
                             interpret=True)
    want = group_norm(x, scale, bias, num_groups=32, eps=1e-5, act="silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_pallas_grad_interpret():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.float32)
    scale = jnp.full((32,), 1.1, jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)

    def loss(fn, **kw):
        return lambda x, s, b: jnp.sum(fn(x, s, b, num_groups=8, eps=1e-5, act="silu", **kw) ** 2)

    g_got = jax.grad(loss(group_norm, interpret=True), argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss(reference_group_norm), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_upsample_fold_exactness():
    """FoldedUpsampleConv == conv3x3(nearest_upsample_2x(x)) bit-for-bit algebra (the
    fold is perf-REJECTED — BASELINE.md r4 — but kept with its exactness proof)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lkgd_tpu.models.blocks_svd import nearest_upsample_2x, upsample2x_conv3x3

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        nearest_upsample_2x(x), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = upsample2x_conv3x3(x, w, b, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
