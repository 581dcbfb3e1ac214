"""Flash attention under jit-over-mesh SPMD (VERDICT r3 item 4).

A Mosaic custom call cannot be partitioned by XLA's SPMD pass, so compiling any graph
that reaches the flash kernel under a mesh (the full-size joint deployment — the 576x1024
trans/smooth configs OOM one chip and run ONLY on the mesh) used to die with "Mosaic
kernels cannot be automatically partitioned". flash_attention/_with_lse now shard_map
themselves over the batch dim when tracing under an active ``jax.set_mesh``
(ops/flash_attention._auto_shard_axes). These tests run the wrapped calls on the 8-device
CPU mesh in interpret mode and check numerics + gradients against the XLA formulation,
plus the trace-time axis-selection logic itself.

Numeric tests run on 2- and 4-device sub-meshes: interpret-mode pallas emulation with 8
concurrent device programs livelocks on a single-CPU host (measured: (2,)- and
(2,2)-mesh runs finish in seconds, the same call on the (2,4) 8-device mesh never
returns). The 8-device mesh still covers the pallas-free axis-selection tests; the
real-topology composition (Mosaic inside shard_map inside jit-over-mesh) is certified by
the AOT v5e:2x4 compile in bench.py (LKGD_BENCH_MESH=joint, mosaic_calls > 0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkgd_tpu.ops.attention import _xla_attention
from lkgd_tpu.ops.flash_attention import (_auto_shard_axes, flash_attention,
                                          flash_attention_with_lse)

B, S, H, D = 8, 256, 2, 8


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.array(jax.devices()[:n]).reshape(shape), names)


def _qkv(dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, S, H, D), dtype)
    k = jax.random.normal(kk, (B, S, H, D), dtype)
    v = jax.random.normal(kv, (B, S, H, D), dtype)
    return q, k, v


def test_auto_shard_axes_selection():
    mesh = _mesh((2, 4), ("data", "context"))
    with jax.set_mesh(mesh):
        # both axes divide batch 8 -> both on the batch dim, in mesh order
        assert _auto_shard_axes(8, 2)[1:] == (("data", "context"), ())
        # batch 2: data on batch, context falls through to the head dim (h=8)
        assert _auto_shard_axes(2, 8)[1:] == (("data",), ("context",))
        # batch 3, heads 3: nothing divides -> replicated manual fallback (mesh kept)
        mesh_out, b, h = _auto_shard_axes(3, 3)
        assert mesh_out is not None and b == () and h == ()
    # no active mesh -> no wrap at all
    assert _auto_shard_axes(8, 8)[0] is None


def test_auto_shard_axes_skips_manual_axes():
    """Axes already mapped by an enclosing shard_map are Manual — never re-mapped."""
    mesh = _mesh((2, 4), ("data", "context"))
    seen = []

    def body(x):
        seen.append(_auto_shard_axes(8, 8)[0])
        return x

    with jax.set_mesh(mesh):
        jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(("data", "context")),
                              out_specs=P(("data", "context"))))(jnp.ones((8, 4)))
    assert seen == [None]


def test_flash_head_sharded_tp_layout():
    """TP serving layout: batch too small for the mesh, heads absorb the model axis."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    b, s, h, d = 3, 256, 8, 8  # batch 3 cannot absorb the axis; heads can
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    ref = _xla_attention(q, k, v, None)
    mesh = _mesh((2,), ("model",))
    sh = NamedSharding(mesh, P(None, None, "model"))
    with pltpu.force_tpu_interpret_mode():
        with jax.set_mesh(mesh):
            args = jax.device_put((q, k, v), sh)
            out = jax.jit(flash_attention)(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("layout", [((2, 2), ("data", "context")), ((2,), ("data",))])
def test_flash_under_mesh_matches_xla(layout):
    q, k, v = _qkv()
    ref = _xla_attention(q, k, v, None)
    mesh = _mesh(*layout)
    sh = NamedSharding(mesh, P((mesh.axis_names)))
    with pltpu.force_tpu_interpret_mode():
        with jax.set_mesh(mesh):
            args = jax.device_put((q, k, v), sh)
            out = jax.jit(flash_attention)(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_grad_under_mesh_matches_xla():
    """custom_vjp flash backward inside the shard_map wrap."""
    q, k, v = _qkv()
    gref = jax.grad(lambda *a: _xla_attention(*a, None).sum(), argnums=(0, 1, 2))(q, k, v)
    mesh = _mesh((2, 2), ("data", "context"))
    sh = NamedSharding(mesh, P(("data", "context")))
    with pltpu.force_tpu_interpret_mode():
        with jax.set_mesh(mesh):
            args = jax.device_put((q, k, v), sh)
            g = jax.jit(jax.grad(lambda a, b, c: flash_attention(a, b, c).sum(),
                                 argnums=(0, 1, 2)))(*args)
    for gi, ri in zip(g, gref):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(ri), atol=5e-5, rtol=5e-5)


def test_flash_with_lse_under_mesh():
    q, k, v = _qkv()
    ref = _xla_attention(q, k, v, None)
    mesh = _mesh((2, 2), ("data", "context"))
    sh = NamedSharding(mesh, P(("data", "context")))
    with pltpu.force_tpu_interpret_mode():
        with jax.set_mesh(mesh):
            args = jax.device_put((q, k, v), sh)
            out, lse = jax.jit(flash_attention_with_lse)(*args)
    assert lse.shape == (B, S, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
