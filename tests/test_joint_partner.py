"""Partner-stream exchange: pair-swap fast path vs the take-gather formulation.

Alternating joint masks pair adjacent streams, so the swap is a reshape + reverse of a
size-2 axis. Values must be identical to the general jnp.take(partner_perm) form; under
a row-sharded mesh the reverse must stay collective-free (the take form all-gathers the
full activation per joint block — BASELINE.md session 14, the smooth-graph ICI fix).
Reference semantics: /root/reference/patch/patch.py:454-475 (masked-scatter swap + frame
flip).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkgd_tpu.models.blocks_svd import _partner_streams
from lkgd_tpu.models.configs import JointAttentionConfig
from lkgd_tpu.parallel.collective_audit import audit_compiled


def _take_reference(x, joint, num_frames, flip_frames):
    s = len(joint.mask)
    rows, n, c = x.shape
    perm = jnp.asarray(joint.partner_perm, dtype=jnp.int32)
    if flip_frames and joint.flip:
        xr = x.reshape(s, rows // s // num_frames, num_frames, n, c)
        xr = jnp.take(xr, perm, axis=0)[:, :, ::-1]
    else:
        xr = x.reshape(s, rows // s, n, c)
        xr = jnp.take(xr, perm, axis=0)
    return xr.reshape(rows, n, c)


def test_pair_swap_matches_take_all_variants():
    rng = np.random.default_rng(0)
    for mask in [(0, 1), (0, 1, 0, 1), (0, 1) * 8]:
        for flip in (False, True):
            joint = JointAttentionConfig(mask=mask, flip=flip)
            assert all(p == i ^ 1 for i, p in enumerate(joint.partner_perm))
            T = 4
            rows = len(mask) * T
            x = jnp.asarray(rng.normal(size=(rows, 6, 5)), jnp.float32)
            for flip_frames in (False, True):
                got = _partner_streams(x, joint, T, flip_frames)
                want = _take_reference(x, joint, T, flip_frames)
                np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_non_adjacent_mask_falls_back_to_take():
    joint = JointAttentionConfig(mask=(0, 0, 1, 1))
    assert joint.partner_perm == (2, 3, 0, 1)  # block swap, not adjacent pairs
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 6, 5)), jnp.float32)
    got = _partner_streams(x, joint, 2, False)
    want = _take_reference(x, joint, 2, False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pair_swap_is_collective_free_under_row_sharding():
    """The smooth deployment layout: 16 stream rows sharded 8 ways (pairs chip-local)."""
    mesh = Mesh(np.array(jax.devices()), ("data",))
    joint = JointAttentionConfig(mask=(0, 1) * 8, flip=True)
    T = 2
    rows = 16 * T
    sh = NamedSharding(mesh, P("data"))
    arg = jax.ShapeDtypeStruct((rows, 8, 4), jnp.float32, sharding=sh)
    with jax.set_mesh(mesh):
        comp = jax.jit(lambda x: _partner_streams(x, joint, T, True) * 2.0,
                       out_shardings=sh).lower(arg).compile()
    found = audit_compiled(comp)
    assert "all-gather" not in found, found
