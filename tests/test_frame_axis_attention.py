"""FrameAxisAttention == transposed-token Attention with identical params.

The reference temporal attention transposes to (B*HW, T, C) tokens
(`patch/patch.py:592-597`); FrameAxisAttention keeps (B*T, HW, C) and contracts the
frame axis through dot_general batch dims. Same math, same param tree — these tests pin
the equivalence (and the per-sample context path vs. the reference's per-pixel
broadcast)."""

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.models.layers import Attention, FrameAxisAttention


def _to_frame_tokens(x, b, t, hw, c):
    return np.asarray(x).reshape(b, t, hw, c).transpose(0, 2, 1, 3).reshape(b * hw, t, c)


def _from_frame_tokens(y, b, t, hw, c):
    return np.asarray(y).reshape(b, hw, t, c).transpose(0, 2, 1, 3).reshape(b * t, hw, c)


def test_self_attention_over_frames_matches_transposed():
    b, t, hw, c, heads = 2, 5, 12, 32, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b * t, hw, c)).astype(np.float32))

    fa = FrameAxisAttention(c, heads, c // heads)
    params = fa.init(jax.random.PRNGKey(0), x, t)
    got = fa.apply(params, x, t)

    attn = Attention(c, heads, c // heads)
    xt = jnp.asarray(_to_frame_tokens(x, b, t, hw, c))
    want = _from_frame_tokens(attn.apply(params, xt), b, t, hw, c)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_partner_context_matches_transposed_cross():
    b, t, hw, c, heads = 2, 4, 8, 16, 2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b * t, hw, c)).astype(np.float32))
    partner = jnp.asarray(rng.normal(size=(b * t, hw, c)).astype(np.float32))

    fa = FrameAxisAttention(c, heads, c // heads)
    params = fa.init(jax.random.PRNGKey(0), x, t, encoder_hidden_states=partner)
    got = fa.apply(params, x, t, encoder_hidden_states=partner)

    attn = Attention(c, heads, c // heads)
    xt = jnp.asarray(_to_frame_tokens(x, b, t, hw, c))
    pt = jnp.asarray(_to_frame_tokens(partner, b, t, hw, c))
    want = _from_frame_tokens(attn.apply(params, xt, encoder_hidden_states=pt),
                              b, t, hw, c)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_per_sample_context_matches_per_pixel_broadcast():
    """Cross-attention with (B, L, D) context == the reference's per-pixel broadcast."""
    b, t, hw, c, heads, l, d_ctx = 2, 3, 6, 16, 2, 4, 24
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b * t, hw, c)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, l, d_ctx)).astype(np.float32))

    fa = FrameAxisAttention(c, heads, c // heads, kv_dim=d_ctx)
    params = fa.init(jax.random.PRNGKey(0), x, t, encoder_hidden_states=ctx,
                     per_sample_ctx=True)
    got = fa.apply(params, x, t, encoder_hidden_states=ctx, per_sample_ctx=True)

    # reference semantics: context broadcast to every pixel of the (B*HW, T, C) tokens
    attn = Attention(c, heads, c // heads, kv_dim=d_ctx)
    xt = jnp.asarray(_to_frame_tokens(x, b, t, hw, c))
    ctx_px = jnp.broadcast_to(np.asarray(ctx)[:, None], (b, hw, l, d_ctx)).reshape(
        b * hw, l, d_ctx)
    want = _from_frame_tokens(attn.apply(params, xt, encoder_hidden_states=ctx_px),
                              b, t, hw, c)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
