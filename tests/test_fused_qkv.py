"""Fused-QKV self-attention: one (C, 3*H*D) matmul must be numerically equivalent to the
three separate projections (columnwise, x @ [Wq|Wk|Wv] computes exactly the same dot
products), and the packed flash unpack kernel must match the unfused flash path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lkgd_tpu.models.layers import Attention, FrameAxisAttention
from lkgd_tpu.ops import flash_attention as fa


@pytest.fixture
def fused(monkeypatch):
    monkeypatch.setenv("LKGD_FUSED_QKV", "1")


def test_attention_fused_matches_unfused(fused, monkeypatch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 320)).astype(np.float32))
    mod = Attention(query_dim=320, heads=5, dim_head=64)
    params = mod.init(jax.random.PRNGKey(0), x)
    out_fused = mod.apply(params, x)
    monkeypatch.delenv("LKGD_FUSED_QKV")
    out_ref = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_attention_param_tree_identical(fused, monkeypatch):
    """Fused and unfused declarations must produce the SAME param pytree (paths, shapes,
    and init values) so ported checkpoints work with either path."""
    x = jnp.zeros((1, 8, 320))
    mod = Attention(query_dim=320, heads=5, dim_head=64)
    p_fused = mod.init(jax.random.PRNGKey(7), x)
    monkeypatch.delenv("LKGD_FUSED_QKV")
    p_ref = mod.init(jax.random.PRNGKey(7), x)
    assert jax.tree_util.tree_structure(p_fused) == jax.tree_util.tree_structure(p_ref)
    for a, b in zip(jax.tree_util.tree_leaves(p_fused), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frame_axis_attention_fused_matches_unfused(fused, monkeypatch):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 16, 320)).astype(np.float32))  # B=2, T=3
    mod = FrameAxisAttention(query_dim=320, heads=5, dim_head=64)
    params = mod.init(jax.random.PRNGKey(0), x, 3)
    out_fused = mod.apply(params, x, 3)
    monkeypatch.delenv("LKGD_FUSED_QKV")
    out_ref = mod.apply(params, x, 3)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_attention_cross_and_lora_keep_unfused_path(fused):
    """Cross-attention and adapter-carrying projections must not take the fused path
    (different context / per-stream gating); they still work with the env flag set."""
    from lkgd_tpu.models.layers import LoraSpec

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 320)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 1, 1024)).astype(np.float32))
    cross = Attention(query_dim=320, heads=5, dim_head=64, kv_dim=1024)
    params = cross.init(jax.random.PRNGKey(0), x, ctx)
    assert cross.apply(params, x, ctx).shape == (2, 32, 320)

    lora = Attention(query_dim=320, heads=5, dim_head=64,
                     adapters_q=(LoraSpec("a", rank=2, streams=(1, 0)),))
    params = lora.init(jax.random.PRNGKey(0), x)
    assert "lora_a_A" in params["params"]["to_q"]
    assert lora.apply(params, x).shape == (2, 32, 320)


def test_flash_packed_matches_flash_interpret():
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    B, S, H, D = 2, 256, 3, 64
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
               for _ in range(3))
    y = jnp.concatenate([q.reshape(B, S, H * D), k.reshape(B, S, H * D),
                         v.reshape(B, S, H * D)], axis=-1)
    with pltpu.force_tpu_interpret_mode():
        out_packed = fa.flash_attention_packed(y, H)
        out_ref = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)


def test_flash_packed_gradients_interpret():
    """_split_qkv's custom VJP (merge kernel) must route cotangents back to the packed
    projection exactly like the reference unfused path."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(4)
    B, S, H, D = 1, 128, 2, 32
    y = jnp.asarray(rng.normal(size=(B, S, 3 * H * D)).astype(np.float32))

    def packed_loss(y):
        return jnp.sum(jnp.square(fa.flash_attention_packed(y, H)))

    def ref_loss(y):
        q, k, v = jnp.split(y, 3, axis=-1)
        out = fa.flash_attention(q.reshape(B, S, H, D), k.reshape(B, S, H, D),
                                 v.reshape(B, S, H, D))
        return jnp.sum(jnp.square(out))

    with pltpu.force_tpu_interpret_mode():
        g_packed = jax.grad(packed_loss)(y)
        g_ref = jax.grad(ref_loss)(y)
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)
