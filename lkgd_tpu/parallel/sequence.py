"""Sequence-parallel attention over the ICI mesh — the xDiT Ulysses/ring analog.

The reference scales CogVideoX inference with xfuser's Ulysses (head-sharded all-to-all)
and ring attention over NCCL (`CogVideo-main/tools/parallel_inference/
parallel_inference_xdit.py:14-51`). TPU-native equivalents on a ``context`` mesh axis:

  * ``ulysses_attention``: tokens sharded (B, S/P, H, D) -> all-to-all exchanges the
    sequence shard for a head shard -> full-sequence attention on H/P heads ->
    all-to-all back. Two all-to-alls per attention, rides ICI.
  * ``ring_attention``: K/V blocks rotate around the ring via ``ppermute`` with online
    softmax accumulation — O(S/P) memory per device, P steps.

Both are written against ``shard_map`` so XLA sees the collectives explicitly.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkgd_tpu.ops.attention import _xla_attention


def _ulysses_body(q, k, v, axis: str):
    """Per-shard body: q/k/v (B, S/P, H, D) -> out (B, S/P, H, D)."""
    # exchange: split heads across devices, gather full sequence
    q = jax.lax.all_to_all(q, axis, split_axis=2, concat_axis=1, tiled=True)
    k = jax.lax.all_to_all(k, axis, split_axis=2, concat_axis=1, tiled=True)
    v = jax.lax.all_to_all(v, axis, split_axis=2, concat_axis=1, tiled=True)
    out = _xla_attention(q, k, v, None)  # (B, S, H/P, D)
    return jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2, tiled=True)


def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh,
                      axis: str = "context") -> jnp.ndarray:
    """(B, S, H, D) attention with S sharded over ``axis``. H must divide by the axis size."""
    spec = P(None, axis, None, None)
    fn = jax.shard_map(functools.partial(_ulysses_body, axis=axis), mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def _ring_body(q, k, v, axis: str):
    """Ring attention with online softmax: K/V shards rotate via ppermute."""
    p = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    scale = q.shape[-1] ** -0.5

    def step(carry, _):
        k_blk, v_blk, m, l, acc = carry
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_blk,
                            preferred_element_type=jnp.float32) * scale
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        probs = jnp.exp(logits - m_new)
        l_new = alpha * l + jnp.sum(probs, axis=-1, keepdims=True)
        acc_new = acc * alpha.swapaxes(1, 2) + jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32)
        perm = [(i, (i + 1) % p) for i in range(p)]
        k_next = jax.lax.ppermute(k_blk, axis, perm)
        v_next = jax.lax.ppermute(v_blk, axis, perm)
        return (k_next, v_next, m_new, l_new, acc_new), None

    # derive carries from q so their device-varying type matches the loop outputs
    m0 = q.swapaxes(1, 2)[..., :1].astype(jnp.float32) * 0.0 - 1e30  # (b, h, sq, 1)
    l0 = m0 * 0.0
    acc0 = q.astype(jnp.float32) * 0.0
    (k, v, m, l, acc), _ = jax.lax.scan(step, (k, v, m0, l0, acc0), None, length=p)
    del idx
    return (acc / l.swapaxes(1, 2)).astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh,
                   axis: str = "context") -> jnp.ndarray:
    """(B, S, H, D) attention with S sharded over ``axis``; K/V circulate the ring."""
    spec = P(None, axis, None, None)
    fn = jax.shard_map(functools.partial(_ring_body, axis=axis), mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def cfg_parallel_split(mesh: Mesh, batch: jnp.ndarray, axis: str = "data") -> jnp.ndarray:
    """CFG-parallelism (xDiT --use_cfg_parallel): the uncond/cond halves are just batch
    rows here, so sharding the batch axis over ``axis`` IS cfg parallelism."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis)))
