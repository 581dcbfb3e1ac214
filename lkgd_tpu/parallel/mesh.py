"""Device mesh + sharding rules — the TPU substrate replacing the reference's NCCL stack.

The reference scales with accelerate DDP / DeepSpeed ZeRO over NCCL
(`train_models/train_svd_lora.py:973-979`, `CogVideo-main/finetune/configs/zero2.yaml`) and
xDiT Ulysses/ring sequence parallelism for inference
(`CogVideo-main/tools/parallel_inference/parallel_inference_xdit.py:14-51`).
TPU-native equivalents (SURVEY.md §2.9, §5):

  * one ``jax.sharding.Mesh`` with axes ``(data, context)``; gradients all-reduce over ICI
    by pjit partitioning (DDP analog)
  * optimizer-state sharding along ``data`` (ZeRO analog) — see training.train_state
  * frame-axis (context) sharding of video activations: XLA inserts the all-gathers that
    temporal attention needs (Ulysses/ring analog); spatial attention needs no comms

Video batch convention: ``(B, T, H, W, C)`` -> P("data", "context") on (B, T).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CONTEXT_AXIS = "context"


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh; default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    axes = dict(axes) if axes else {DATA_AXIS: len(devices)}
    n = int(np.prod(list(axes.values())))
    if n != len(devices):
        raise ValueError(f"mesh axes {axes} need {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def video_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, ...) sharded batch over data, frames over context (if present)."""
    if CONTEXT_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, CONTEXT_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, ...) sharded over data only."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, tree, video_keys: Sequence[str] = ()):
    """Device_put a pytree of host arrays with per-leaf shardings: leaves with >= 2 dims
    get (data, context) on their first two axes when named in ``video_keys``; all other
    leaves are data-sharded on axis 0."""
    vid = video_batch_sharding(mesh)
    flat = batch_sharding(mesh)

    def put(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return jax.device_put(x, vid if name in video_keys and x.ndim >= 2 else flat)

    return jax.tree_util.tree_map_with_path(put, tree)
