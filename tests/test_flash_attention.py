"""Flash-attention kernel correctness (interpret mode on CPU; the real-TPU run is part of
the bench/verify flow — see .claude/skills/verify/SKILL.md)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lkgd_tpu.ops.attention import _xla_attention
from lkgd_tpu.ops import flash_attention as fa


def test_supports():
    assert fa.supports((2, 9216, 5, 64), (2, 9216, 5, 64))
    assert fa.supports((2, 2304, 10, 64), (2, 2304, 10, 64))
    assert fa.supports((2, 100, 5, 64), (2, 100, 5, 64))  # padded to a block multiple
    assert not fa.supports((2, 100, 5, 33), (2, 100, 5, 33))  # head dim not 8-aligned


def test_matches_xla_interpret():
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 256, 3, 32
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32)) for _ in range(3))
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_cross_attention_shapes_interpret():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 512, 2, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 128, 2, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 128, 2, 32)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_backward_matches_xla_interpret():
    """Flash custom VJP vs autodiff through the XLA reference (interpret mode)."""
    rng = np.random.default_rng(2)
    B, S, H, D = 1, 256, 2, 32
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
               for _ in range(3))
    tangent = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) * tangent)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None) * tangent)

    with pltpu.force_tpu_interpret_mode():
        gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=2e-3, atol=2e-4)


def test_fwd_lse_consistent_interpret():
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(4, 256, 16)).astype(np.float32))
               for _ in range(3))
    with pltpu.force_tpu_interpret_mode():
        out1 = fa._flash_bhsd(q, k, v, 128, 128)
        out2, lse = fa._flash_fwd_lse_bhsd(q, k, v, 128, 128)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-6)
    # lse == log2(sum exp2(s2)): check against direct computation
    s2 = np.einsum("bqd,bkd->bqk", np.asarray(q), np.asarray(k)) * (16**-0.5) * 1.4426950408889634
    want = np.log2(np.exp2(s2 - s2.max(-1, keepdims=True)).sum(-1)) + s2.max(-1)
    np.testing.assert_allclose(np.asarray(lse)[:, 0], want, rtol=1e-4, atol=1e-4)


def test_padded_nondivisible_sequence_interpret():
    """Sequences no block tiles (CogVideoX-style) are padded + key-masked."""
    rng = np.random.default_rng(4)
    B, S, H, D = 1, 200, 2, 32  # 200 has no block divisor >= 128
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
               for _ in range(3))
    assert fa.supports(q.shape, k.shape)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, None)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_padded_backward_interpret():
    rng = np.random.default_rng(5)
    B, S, H, D = 1, 150, 1, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
               for _ in range(3))
    tangent = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * tangent)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss(fa.flash_attention), argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(loss(lambda q, k, v: _xla_attention(q, k, v, None)),
                 argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def _bhsd(x):
    """(B, S, H, D) -> the kernels' (B*H, S, D) operand layout."""
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def test_bound_kernel_matches_maxtrack_interpret():
    """The bound-subtraction fast path must equal the max-tracking kernel at sane input
    scales (softmax is invariant to WHICH per-row constant is subtracted; both run fp32
    exp2/sum with identical relative precision). The kernels are compared DIRECTLY —
    the LKGD_FLASH_MAXTRACK env switch is read at trace time and cannot be toggled
    between same-shape calls (jit cache)."""
    rng = np.random.default_rng(3)
    B, S, H, D = 2, 256, 3, 32
    q, k, v = (_bhsd(jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32)))
               for _ in range(3))
    with pltpu.force_tpu_interpret_mode():
        out_bound = fa._flash_bhsd(q, k, v, 128, 128)
        out_max = fa._flash_maxtrack_bhsd(q, k, v, 128, 128, None)
    np.testing.assert_allclose(np.asarray(out_bound), np.asarray(out_max),
                               rtol=1e-6, atol=1e-6)


def test_bound_lse_kernel_matches_maxtrack_interpret():
    rng = np.random.default_rng(5)
    B, S, H, D = 2, 256, 2, 32
    q, k, v = (_bhsd(jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32)))
               for _ in range(3))
    with pltpu.force_tpu_interpret_mode():
        out_bound, lse_bound = fa._flash_fwd_lse_bhsd(q, k, v, 128, 128)
        out_max, lse_max = fa._flash_fwd_lse_maxtrack_bhsd(q, k, v, 128, 128, None)
    np.testing.assert_allclose(np.asarray(out_bound), np.asarray(out_max),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_bound), np.asarray(lse_max),
                               rtol=1e-5, atol=1e-5)


def test_bound_kernel_underflow_fallback_interpret():
    """At pathological input scales the Cauchy-Schwarz bound is loose by more than fp32's
    underflow headroom; the l-guard inside _flash_bhsd must reroute to the max-tracking
    kernel instead of emitting NaNs."""
    rng = np.random.default_rng(4)
    B, S, H, D = 1, 256, 2, 32
    q = _bhsd(jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32)) * 60.0)
    k = _bhsd(jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32)) * 60.0)
    v = _bhsd(jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32)))
    with pltpu.force_tpu_interpret_mode():
        out_bound = fa._flash_bhsd(q, k, v, 128, 128)
        out_max = fa._flash_maxtrack_bhsd(q, k, v, 128, 128, None)
    assert not np.any(np.isnan(np.asarray(out_bound)))
    np.testing.assert_allclose(np.asarray(out_bound), np.asarray(out_max),
                               rtol=1e-5, atol=1e-5)
