"""Multi-slice (DCN) mesh axis — SURVEY §2.9 "ICI within a slice, DCN across slices".

The reference's analog is multi-node DeepSpeed (accelerate_config.yaml num_machines;
zero2.yaml) where NCCL rides NVLink within a node and ethernet across nodes. Here a
mesh axis named "slice" models the DCN: make_mesh lays devices out so every ICI axis is
filled within one slice, slice_of_device_map exposes the device->slice map, and
collective_audit.split_dcn_ici classifies each compiled collective by the substrate it
rides. Tests run on the virtual 8-device CPU mesh (2 slices x 4 chips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lkgd_tpu.parallel import mesh as meshlib
from lkgd_tpu.parallel.collective_audit import (_parse_groups, crosses_slices,
                                                split_dcn_ici)

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def test_hybrid_layout_slices_are_contiguous():
    mesh = meshlib.make_mesh({"slice": 2, "data": 4})
    arr = mesh.devices
    assert arr.shape == (2, 4)
    # each slice row must be one contiguous 4-device block (the ICI axis)
    ids = np.vectorize(lambda d: d.id)(arr)
    assert set(ids[0]) == {0, 1, 2, 3} and set(ids[1]) == {4, 5, 6, 7}
    smap = meshlib.slice_of_device_map(mesh)
    assert smap == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1, 7: 1}


def test_hybrid_layout_slice_not_leading():
    # caller puts the DCN axis in the middle: ICI axes must still be within-slice.
    # slice_of_device_map keys by LOGICAL (row-major flat) position — the id space
    # compiled-HLO replica_groups use — so translate devices to positions first.
    mesh = meshlib.make_mesh({"data": 2, "slice": 2, "context": 2})
    smap = meshlib.slice_of_device_map(mesh)
    arr = mesh.devices
    pos = {arr[idx].id: flat for flat, idx in enumerate(np.ndindex(arr.shape))}
    sl = lambda d: smap[pos[d.id]]
    for i in range(2):
        for k in range(2):
            assert sl(arr[i, 0, k]) != sl(arr[i, 1, k])  # slice axis crosses slices
        # context axis stays within one slice
        for s in range(2):
            assert sl(arr[i, s, 0]) == sl(arr[i, s, 1])


def test_parse_groups_formats():
    assert _parse_groups("x = bf16[8] all-reduce(y), replica_groups={{0,4},{1,5}}") == \
        [[0, 4], [1, 5]]
    assert _parse_groups("x = bf16[8] all-gather(y), replica_groups=[2,4]<=[8]") == \
        [[0, 1, 2, 3], [4, 5, 6, 7]]
    assert _parse_groups(
        "x = bf16[8] all-gather(y), replica_groups=[4,2]<=[2,4]T(1,0)") == \
        [[0, 4], [1, 5], [2, 6], [3, 7]]
    assert _parse_groups(
        "x = bf16[8] collective-permute(y), source_target_pairs={{0,1},{1,0}}") == \
        [[0, 1], [1, 0]]
    assert _parse_groups("x = bf16[8] all-reduce(y)") is None  # no groups -> None


def test_crosses_slices():
    smap = {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1, 7: 1}
    assert not crosses_slices("all-reduce(x), replica_groups={{0,1,2,3},{4,5,6,7}}", smap)
    assert crosses_slices("all-reduce(x), replica_groups={{0,4},{1,5}}", smap)
    assert crosses_slices("all-reduce(x)", smap)  # unparseable -> conservative DCN


def test_compiled_traffic_classification():
    """psum over the intra-slice axis classifies ICI; over the slice axis, DCN."""
    mesh = meshlib.make_mesh({"slice": 2, "data": 4})
    from jax.sharding import NamedSharding, PartitionSpec as P

    def over(axis):
        def f(x):
            return jax.lax.psum(x, axis)

        return jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("slice", "data"),
                                     out_specs=P("slice", "data")))

    x = jnp.ones((2, 4))
    smap = meshlib.slice_of_device_map(mesh)
    hlo_ici = over("data").lower(x).compile().as_text()
    split = split_dcn_ici(hlo_ici, smap)
    assert sum(len(v) for v in split["ici"].values()) > 0
    assert sum(len(v) for v in split["dcn"].values()) == 0, split["dcn"]

    hlo_dcn = over("slice").lower(x).compile().as_text()
    split = split_dcn_ici(hlo_dcn, smap)
    assert sum(len(v) for v in split["dcn"].values()) > 0


def test_hybrid_zero_train_numerics_match_flat_mesh():
    """A ZeRO-ish data-parallel step over {slice:2, data:4} must produce the same
    update as the flat {data:8} mesh (the hybrid layout changes WHERE collectives run,
    never their math)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    def step(w, x):
        g = jax.grad(loss)(w, x)
        return w - 0.1 * g

    w = jnp.asarray(np.random.default_rng(0).normal(size=(16, 16)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 16)), jnp.float32)

    outs = []
    for axes, batch_axes in (({"slice": 2, "data": 4}, ("slice", "data")),
                             ({"data": 8}, ("data",))):
        mesh = meshlib.make_mesh(axes)
        xs = jax.device_put(x, NamedSharding(mesh, P(batch_axes)))
        ws = jax.device_put(w, NamedSharding(mesh, P()))
        with jax.set_mesh(mesh):
            outs.append(np.asarray(jax.jit(step)(ws, xs)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)


def test_megascale_send_classified_dcn():
    """Cross-slice legs of hybrid collectives lower as MegaScale host transfers on
    real 2-slice topologies (observed r5: within-slice reduce-scatter/all-gather +
    send/recv with _xla_host_transfer_handler_name=xla_megascale_runtime) — the DCN
    split must count those send payloads."""
    hlo = "\n".join([
        'HloModule m',
        '%rs = f32[32,256] reduce-scatter(%x), channel_id=1, '
        'replica_groups={{0,1,2,3,4,5,6,7}}, use_global_device_ids=true',
        '%send = (f32[8,8,128], u32[], token[]) send(%b, %t), channel_id=2, '
        'is_host_transfer=true, frontend_attributes='
        '{_xla_host_transfer_handler_name="xla_megascale_runtime"}',
    ])
    smap = {i: int(i >= 8) for i in range(16)}
    split = split_dcn_ici(hlo, smap)
    assert "megascale-send" in split["dcn"]
    bytes_sent = split["dcn"]["megascale-send"][0][0]
    assert bytes_sent == 8 * 8 * 128 * 4 + 4, bytes_sent
    assert "reduce-scatter" in split["ici"]  # groups {0..7} stay within slice 0
