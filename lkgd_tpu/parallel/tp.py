"""Tensor-parallel / FSDP-style parameter sharding over a mesh ``model`` axis.

The reference never shards model weights at inference (xDiT shards the sequence only,
`CogVideo-main/tools/parallel_inference/parallel_inference_xdit.py:14-51`; DeepSpeed
ZeRO shards optimizer state at training, `finetune/configs/zero2.yaml`). On TPU the
5B-parameter CogVideoX DiT at bf16 is ~11 GB — most of a v5e chip's 16 GB — so serving
wants the weights themselves spread over the mesh. pjit-native recipe: build a
PartitionSpec tree for the params, ``device_put`` them once, and let GSPMD insert the
collectives; model code stays unchanged.

Two spec builders:

  * :func:`cogvideox_tp_specs` — megatron-style: attention q/k/v and ff_0 kernels
    column-sharded (head/hidden dim), to_out and ff_2 row-sharded, everything else
    replicated. Activation collectives ride ICI once per block pair.
  * :func:`fsdp_specs` — model-agnostic: every leaf's largest evenly-divisible axis is
    sharded once it exceeds ``min_size`` elements. Pure memory scaling (GSPMD
    all-gathers weights at use — the ZeRO-3 schedule), works for any param tree
    (SVD UNet, VAEs, CogVideoX alike).

Equivalence + per-device-bytes tests: tests/test_tensor_parallel.py.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def cogvideox_tp_specs(params, axis: str = MODEL_AXIS):
    """PartitionSpec tree for a CogVideoX param tree (megatron-style block sharding).

    Column-parallel (output dim sharded): attn ``to_q/to_k/to_v`` kernels and biases,
    ``ff_0``. Row-parallel (input dim sharded): ``to_out``, ``ff_2`` kernels — their
    biases stay replicated (added after the implicit reduce). Norms, embeddings,
    adaLN, patch/proj layers, knowledge fusion and LoRA adapters stay replicated
    (LoRA ranks are tiny; GSPMD reshards their outputs as needed)."""

    def spec_for(path, leaf):
        p = _path_str(path)
        if "lora_" in p:
            return P()
        col = any(f"{name}/kernel" in p for name in ("to_q", "to_k", "to_v", "ff_0"))
        col_b = any(f"{name}/bias" in p for name in ("to_q", "to_k", "to_v", "ff_0"))
        row = any(f"{name}/kernel" in p for name in ("to_out", "ff_2"))
        if col and leaf.ndim == 2 and leaf.shape[1] > 1:
            return P(None, axis)
        if col_b and leaf.ndim == 1:
            return P(axis)
        if row and leaf.ndim == 2 and leaf.shape[0] > 1:
            return P(axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def fsdp_specs(params, axis: str = MODEL_AXIS, min_size: int = 2 ** 16, *,
               axis_size: int):
    """Model-agnostic weight sharding: each leaf >= ``min_size`` elements gets its
    largest axis divisible by ``axis_size`` sharded over ``axis`` (ZeRO-3 analog —
    GSPMD all-gathers at use). Leaves with no divisible axis stay replicated.
    ``axis_size`` (the mesh's ``axis`` extent) is required — omitting it would
    silently produce an all-replicated tree."""

    def spec_for(path, leaf):
        del path
        if leaf.size < min_size:
            return P()
        dims = sorted(range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True)
        for d in dims:
            if leaf.shape[d] % axis_size == 0 and leaf.shape[d] >= axis_size:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return P(*spec)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params, specs):
    """device_put the param tree with the given PartitionSpec tree."""
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)


def per_device_param_bytes(params) -> int:
    """Bytes of params resident on device 0 (what one chip actually holds)."""
    total = 0
    for leaf in jax.tree.leaves(params):
        shard = leaf.addressable_shards[0]
        total += shard.data.size * leaf.dtype.itemsize
    return total
