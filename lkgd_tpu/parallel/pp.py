"""Pipeline parallelism (GPipe schedule) over a mesh ``stage`` axis — TPU-native.

The reference scales depth-wise only through ZeRO sharding (DeepSpeed
`CogVideo-main/finetune/configs/zero2.yaml`); it has no pipeline engine. On TPU pods,
pipelining the DiT's identical transformer blocks over a ``stage`` mesh axis trades the
tensor-parallel all-reduces for a single activation ``ppermute`` per block group —
the right trade once a model spans slow ICI hops (multi-slice / DCN).

SPMD formulation (the "pipelining via collective-permute" recipe from the public TPU
scaling playbook): every device runs the same program under ``shard_map``; the stacked
per-layer params (leading axis L) are sharded over ``stage`` so each device holds L/S
consecutive layers; microbatches march through stages with ``lax.ppermute`` rotations
inside one ``lax.scan`` — no host loop, one compiled program, bubbles included.

Scope: the block stack only (in a 42-layer CogVideoX DiT the blocks are ~99% of step
time); embeddings and the output head run replicated outside the pipelined segment.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

STAGE_AXIS = "stage"

_GPIPE_CACHE: dict = {}


def stack_block_params(params, num_blocks: int, prefix: str = "transformer_blocks_"):
    """Stack the per-block param subtrees ``{prefix}{i}`` into one tree with a leading
    layer axis (L, ...) — the layout the pipeline shards over ``stage``."""
    blocks = [params[f"{prefix}{i}"] for i in range(num_blocks)]
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *blocks)


def cogvideox_pp_blocks(cfg, params, mesh: Mesh, num_microbatches: int,
                        axis: str = STAGE_AXIS, dtype=None):
    """Build a ``blocks_override`` callback for ``CogVideoXTransformer3D.__call__``:
    the full forward (embeddings and head replicated) with the 42-block stack executed
    as a GPipe pipeline over the mesh ``stage`` axis. ``params`` is the transformer's
    full variable dict (``{"params": ...}``); the per-block subtrees are stacked and
    stage-sharded here, the rest stays untouched."""
    import jax.numpy as jnp

    from lkgd_tpu.models.cogvideox import CogVideoXBlock

    stacked = stack_block_params(params["params"], cfg.num_layers)
    block = CogVideoXBlock(cfg, "pp", dtype=dtype or jnp.float32)

    def step(lp, st, cst):
        hid, enc = block.apply({"params": lp}, st["hidden"], st["encoder"],
                               st["temb"], cst)
        return {"hidden": hid, "encoder": enc, "temb": st["temb"]}

    def blocks(hidden, encoder, emb, rope):
        state = {"hidden": hidden, "encoder": encoder, "temb": emb}
        out = gpipe(step, stacked, state, rope, mesh=mesh,
                    num_microbatches=num_microbatches, axis=axis)
        return out["hidden"], out["encoder"]

    return blocks


def gpipe(step_fn: Callable, stacked_params, state, consts, *, mesh: Mesh,
          num_microbatches: int, axis: str = STAGE_AXIS):
    """Run ``L`` layers over ``S = mesh.shape[axis]`` pipeline stages, GPipe-style.

    step_fn(layer_params, state, consts) -> state      (ONE layer; layers homogeneous)
    stacked_params: pytree with leading layer axis L (L % S == 0); sharded over
        ``axis`` so each device keeps L/S consecutive layers.
    state: pytree of (B, ...) arrays carried through every layer (B % M == 0). Inputs a
        layer needs per-sample but does not transform (e.g. the adaLN time embedding)
        belong in ``state`` as pass-through leaves so they microbatch correctly.
    consts: pytree of batch-independent inputs, replicated (e.g. RoPE tables).

    Returns ``state`` after all L layers, identical (up to fp reassociation) to a
    sequential ``lax.scan`` of ``step_fn`` over the full stack.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} layers do not split over {S} stages")
    b = jax.tree.leaves(state)[0].shape[0]
    if b % M:
        raise ValueError(f"batch {b} does not split into {M} microbatches")

    mb_state = jax.tree.map(lambda x: x.reshape((M, b // M) + x.shape[1:]), state)

    def run(local_params, mb, cst):
        s = jax.lax.axis_index(axis)

        def local_apply(st):
            return jax.lax.scan(lambda c, lp: (step_fn(lp, c, cst), None),
                                st, local_params)[0]

        buf = jax.tree.map(lambda x: jnp.zeros_like(x[0]), mb)
        out = jax.tree.map(jnp.zeros_like, mb)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            buf, out = carry
            inject = jax.tree.map(lambda x: x[jnp.clip(t, 0, M - 1)], mb)
            cur = jax.tree.map(lambda a, c: jnp.where(s == 0, a, c), inject, buf)
            y = local_apply(cur)
            idx = t - (S - 1)
            ok = (s == S - 1) & (idx >= 0)
            safe = jnp.clip(idx, 0, M - 1)
            out = jax.tree.map(
                lambda o, yy: o.at[safe].set(jnp.where(ok, yy, o[safe])), out, y)
            buf = jax.tree.map(lambda yy: jax.lax.ppermute(yy, axis, perm), y)
            return (buf, out), None

        (_, out), _ = jax.lax.scan(tick, (buf, out), jnp.arange(M + S - 1))
        # only the last stage holds real outputs; broadcast so every device returns them
        out = jax.tree.map(
            lambda o: jax.lax.psum(jnp.where(s == S - 1, o, jnp.zeros_like(o)), axis),
            out)
        return out

    # cache the wrapped program per (step_fn, mesh, schedule, tree structures) so
    # repeated calls (e.g. one per denoise step through blocks_override) reuse one
    # jit cache instead of re-tracing a fresh closure every time
    key = (step_fn, mesh, axis, M, jax.tree.structure(stacked_params),
           jax.tree.structure(mb_state), jax.tree.structure(consts))
    sm = _GPIPE_CACHE.get(key)
    if sm is None:
        spec_params = jax.tree.map(lambda _: P(axis), stacked_params)
        spec_state = jax.tree.map(lambda _: P(), mb_state)
        spec_consts = jax.tree.map(lambda _: P(), consts)
        sm = jax.jit(jax.shard_map(run, mesh=mesh,
                                   in_specs=(spec_params, spec_state, spec_consts),
                                   out_specs=jax.tree.map(lambda _: P(), mb_state),
                                   check_vma=False))
        _GPIPE_CACHE[key] = sm
    out = sm(stacked_params, mb_state, consts)
    return jax.tree.map(lambda x: x.reshape((b,) + x.shape[2:]), out)
