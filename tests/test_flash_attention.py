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
    assert not fa.supports((2, 100, 5, 64), (2, 100, 5, 64))  # no block divides 100


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
