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


def _joint_qkv(b=2, st=5, sv=64, h=8, d=16, seed=3):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=(b, st + sv, h, d)).astype(np.float32))
                 for _ in range(3))


def test_joint_sp_attention_ulysses():
    from lkgd_tpu.parallel.sequence import joint_sp_attention

    mesh = make_mesh({"context": 8})
    q, k, v = _joint_qkv()
    ref = _xla_attention(q, k, v, None)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda a, b, c: joint_sp_attention(a, b, c, 5, "ulysses"))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_joint_sp_attention_ring():
    from lkgd_tpu.parallel.sequence import joint_sp_attention

    # text length 5 is NOT divisible by the ring size 8 — exercises the query padding
    mesh = make_mesh({"context": 8})
    q, k, v = _joint_qkv(seed=4)
    ref = _xla_attention(q, k, v, None)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda a, b, c: joint_sp_attention(a, b, c, 5, "ring"))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_attention_with_lse_block_combine():
    """The (out, lse) block-combine identity ring attention relies on."""
    from lkgd_tpu.ops.attention import attention_with_lse

    q, k, v = _qkv(s=64, seed=5)
    ref = _xla_attention(q, k, v, None)
    o1, l1 = attention_with_lse(q, k[:, :24], v[:, :24])
    o2, l2 = attention_with_lse(q, k[:, 24:], v[:, 24:])
    m = jnp.maximum(l1, l2)
    num = o1 * jnp.exp2(l1 - m)[..., None] + o2 * jnp.exp2(l2 - m)[..., None]
    den = jnp.exp2(l1 - m) + jnp.exp2(l2 - m)
    np.testing.assert_allclose(np.asarray(num / den[..., None]), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_ulysses_under_jit_with_sharded_inputs():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh({"context": 8})
    q, k, v = _qkv(seed=2)
    spec = NamedSharding(mesh, P(None, "context"))
    q, k, v = (jax.device_put(x, spec) for x in (q, k, v))
    out = jax.jit(lambda a, b, c: ulysses_attention(a, b, c, mesh))(q, k, v)
    ref = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
