"""Ulysses all-to-all and ring attention vs single-device attention on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from lkgd_tpu.ops.attention import _xla_attention
from lkgd_tpu.parallel.mesh import make_mesh
from lkgd_tpu.parallel.sequence import ring_attention, ulysses_attention


def _qkv(b=2, s=64, h=8, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
                 for _ in range(3))


def test_ulysses_matches_reference():
    mesh = make_mesh({"context": 8})
    q, k, v = _qkv()
    ref = _xla_attention(q, k, v, None)
    out = ulysses_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_matches_reference():
    mesh = make_mesh({"context": 8})
    q, k, v = _qkv(seed=1)
    ref = _xla_attention(q, k, v, None)
    out = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ulysses_under_jit_with_sharded_inputs():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh({"context": 8})
    q, k, v = _qkv(seed=2)
    spec = NamedSharding(mesh, P(None, "context"))
    q, k, v = (jax.device_put(x, spec) for x in (q, k, v))
    out = jax.jit(lambda a, b, c: ulysses_attention(a, b, c, mesh))(q, k, v)
    ref = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
