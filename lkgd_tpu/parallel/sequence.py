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


def _ulysses_body(q, k, v, axis: str):
    """Per-shard body: q/k/v (B, S/P, H, D) -> out (B, S/P, H, D)."""
    from lkgd_tpu.ops.attention import dot_product_attention

    # exchange: split heads across devices, gather full sequence
    q = jax.lax.all_to_all(q, axis, split_axis=2, concat_axis=1, tiled=True)
    k = jax.lax.all_to_all(k, axis, split_axis=2, concat_axis=1, tiled=True)
    v = jax.lax.all_to_all(v, axis, split_axis=2, concat_axis=1, tiled=True)
    # flash kernel on TPU — the full-sequence block is exactly where S×S logits
    # would not fit (S=17776 at CogVideoX sizes); XLA softmax elsewhere
    out = dot_product_attention(q, k, v)  # (B, S, H/P, D)
    return jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2, tiled=True)


def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh,
                      axis: str = "context") -> jnp.ndarray:
    """(B, S, H, D) attention with S sharded over ``axis``. H must divide by the axis size."""
    spec = P(None, axis, None, None)
    fn = jax.shard_map(functools.partial(_ulysses_body, axis=axis), mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def _ring_body(q, k, v, axis: str):
    """Ring attention: K/V shards rotate via ppermute; per-block (out, lse) partials from
    ``attention_with_lse`` (the flash kernel on TPU — no S/P × S/P logits materialized
    inside a shard) combine exactly in the log2 domain."""
    from lkgd_tpu.ops.attention import attention_with_lse

    p = jax.lax.axis_size(axis)

    # phase 0: the device's own K/V shard
    o, m = attention_with_lse(q, k, v)
    num = o.astype(jnp.float32)
    den = jnp.ones_like(m)

    def step(carry, _):
        kb, vb, m, num, den = carry
        perm = [(j, (j + 1) % p) for j in range(p)]
        kb = jax.lax.ppermute(kb, axis, perm)
        vb = jax.lax.ppermute(vb, axis, perm)
        o, lse = attention_with_lse(q, kb, vb)
        m_new = jnp.maximum(m, lse)
        c_old = jnp.exp2(m - m_new)
        c_new = jnp.exp2(lse - m_new)
        num = num * c_old[..., None] + o.astype(jnp.float32) * c_new[..., None]
        den = den * c_old + c_new
        return (kb, vb, m_new, num, den), None

    (k, v, m, num, den), _ = jax.lax.scan(step, (k, v, m, num, den), None, length=p - 1)
    return (num / den[..., None]).astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh,
                   axis: str = "context") -> jnp.ndarray:
    """(B, S, H, D) attention with S sharded over ``axis``; K/V circulate the ring."""
    spec = P(None, axis, None, None)
    fn = jax.shard_map(functools.partial(_ring_body, axis=axis), mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


# ------------------------------------------------------------------ joint text+video SP
# The load-bearing integration: CogVideoX attention runs over a joint [text ∥ video]
# sequence (text 226 tokens replicated, video tokens sharded over the ``context`` axis).
# ``joint_sp_attention`` is what CogVideoXAttention calls when
# CogVideoXConfig.sequence_parallel is "ulysses" or "ring" — the xDiT integration analog
# (`parallel_inference_xdit.py:14-51`), with the inner attention going through
# dot_product_attention / attention_with_lse so the Pallas flash kernel handles the
# full-sequence block on TPU (no materialized S×S logits).


def _ulysses_joint_body(qt, kt, vt, qv, kv, vv, *, axis: str):
    """text q/k/v (B, St, H, D) replicated; video q/k/v (B, Sv/P, H, D) sharded.
    All-to-all exchanges the video sequence shard for a head shard, each device runs
    full-sequence attention on H/P heads, then exchanges back."""
    p = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    hp = qt.shape[2] // p
    st = qt.shape[1]

    def a2a_heads(x):  # (B, Sv/P, H, D) -> (B, Sv, H/P, D)
        return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)

    qv, kv, vv = a2a_heads(qv), a2a_heads(kv), a2a_heads(vv)
    sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * hp, hp, axis=2)
    q = jnp.concatenate([sl(qt), qv], axis=1)
    k = jnp.concatenate([sl(kt), kv], axis=1)
    v = jnp.concatenate([sl(vt), vv], axis=1)
    from lkgd_tpu.ops.attention import dot_product_attention

    out = dot_product_attention(q, k, v)  # (B, St + Sv, H/P, D)
    ot, ov = out[:, :st], out[:, st:]
    ov = jax.lax.all_to_all(ov, axis, split_axis=1, concat_axis=2, tiled=True)
    ot = jax.lax.all_gather(ot, axis, axis=2, tiled=True)  # heads back together
    return ot, ov


def _ring_joint_body(qt, kt, vt, qv, kv, vv, *, axis: str):
    """Ring attention over the joint sequence: the replicated text K/V block is absorbed
    first, then the P video K/V shards rotate via ppermute; per-block (out, lse) partials
    from attention_with_lse combine exactly in the log2 domain. Text queries are
    padded/sharded over the ring so no query row is computed twice. O(Sv/P) K/V memory
    per device; the inner attention is the flash kernel on TPU. Forward-only."""
    from lkgd_tpu.ops.attention import attention_with_lse

    p = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    st = qt.shape[1]
    stp = -(-st // p) * p  # text queries padded up to a multiple of the ring size
    qt = jnp.pad(qt, ((0, 0), (0, stp - st), (0, 0), (0, 0)))
    qt_l = jax.lax.dynamic_slice_in_dim(qt, i * (stp // p), stp // p, axis=1)
    q = jnp.concatenate([qt_l, qv], axis=1)  # (B, stp/P + Sv/P, H, D)

    # phase 1: text K/V (replicated on every device)
    num, m = attention_with_lse(q, kt, vt)
    den = jnp.ones_like(m)
    num = num.astype(jnp.float32)

    def step(carry, _):
        kb, vb, m, num, den = carry
        o, lse = attention_with_lse(q, kb, vb)
        m_new = jnp.maximum(m, lse)
        c_old = jnp.exp2(m - m_new)
        c_new = jnp.exp2(lse - m_new)
        num = num * c_old[..., None] + o.astype(jnp.float32) * c_new[..., None]
        den = den * c_old + c_new
        perm = [(j, (j + 1) % p) for j in range(p)]
        return (jax.lax.ppermute(kb, axis, perm), jax.lax.ppermute(vb, axis, perm),
                m_new, num, den), None

    (kv_, vv_, m, num, den), _ = jax.lax.scan(step, (kv, vv, m, num, den), None, length=p)
    del kv_, vv_
    out = (num / den[..., None]).astype(qv.dtype)
    ot_l, ov = out[:, :stp // p], out[:, stp // p:]
    ot = jax.lax.all_gather(ot_l, axis, axis=1, tiled=True)[:, :st]  # drop the pad rows
    return ot, ov


def joint_sp_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, text_len: int,
                       mode: str, axis: str = "context") -> jnp.ndarray:
    """Sequence-parallel joint attention over (B, St + Sv, H, D) with the video token
    axis sharded over mesh axis ``axis`` (ambient mesh; call under ``jax.set_mesh``).

    ``mode``: "ulysses" (2 all-to-alls, needs H % P == 0) or "ring" (P ppermute steps,
    O(Sv/P) K/V memory). Both need Sv % P == 0. Returns (B, St + Sv, H, D) with the same
    shardings (text replicated, video tokens sharded)."""
    body = {"ulysses": _ulysses_joint_body, "ring": _ring_joint_body}[mode]
    qt, qv = q[:, :text_len], q[:, text_len:]
    kt, kv = k[:, :text_len], k[:, text_len:]
    vt, vv = v[:, :text_len], v[:, text_len:]
    t_spec = P(None, None, None, None)
    v_spec = P(None, axis, None, None)
    fn = jax.shard_map(functools.partial(body, axis=axis),
                       in_specs=(t_spec, t_spec, t_spec, v_spec, v_spec, v_spec),
                       out_specs=(t_spec, v_spec), check_vma=False)
    ot, ov = fn(qt, kt, vt, qv, kv, vv)
    return jnp.concatenate([ot, ov], axis=1)


def cfg_parallel_split(mesh: Mesh, batch: jnp.ndarray, axis: str = "data") -> jnp.ndarray:
    """CFG-parallelism (xDiT --use_cfg_parallel): the uncond/cond halves are just batch
    rows here, so sharding the batch axis over ``axis`` IS cfg parallelism."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis)))
