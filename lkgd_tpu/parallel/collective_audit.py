"""Collective audit of SPMD programs: what rides the ICI, and how many bytes.

The multi-chip deployment path (BASELINE.md's v5e-8 projection) rests on XLA's SPMD
partitioner inserting the right collectives for the ``(data, context)`` mesh: gradient
all-reduce (lowered to reduce-scatter + all-gather under ZeRO out-shardings), frame-axis
halo/all-gather exchanges for temporal attention under context parallelism, and
all-to-alls for Ulysses attention. This module compiles a function under a mesh and
reports every collective in the optimized HLO with its operand bytes — the audit that
turns "it matches the unsharded output on a CPU mesh" into "and this is exactly what
will ride the interconnect" (reference analog: the DeepSpeed/NCCL wiring the reference
delegates to, `CogVideo-main/finetune/configs/zero2.yaml`, accelerate DDP).

Used by tests/test_collective_audit.py and `python -m lkgd_tpu.parallel.collective_audit`.
"""

from __future__ import annotations

import collections
import re
from typing import Dict, List, Tuple

# optimized-HLO collective ops (channel ops that move data between devices)
COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                  "collective-permute")

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
          "pred": 1, "s64": 8, "f64": 8}


_OP_NAME_RE = re.compile(
    r"\b(?:" + "|".join(re.escape(op) for op in COLLECTIVE_OPS) + r")(?:-start)?\(")


def _result_bytes(line: str) -> int:
    """Bytes of the result shape(s) on the lhs of an HLO instruction line."""
    lhs = line.split(" = ", 1)
    if len(lhs) != 2:
        return 0
    total = 0
    # result may be a tuple: take every typed shape before the OP NAME — not before the
    # first "(", which for tuple results like "(f32[...], u32[]) all-gather-start(...)"
    # is the tuple's own paren and would make the scan swallow operand shapes too
    rhs = lhs[1]
    m_op = _OP_NAME_RE.search(rhs)
    op_pos = m_op.start() if m_op else rhs.find("(")
    for m in _SHAPE_RE.finditer(rhs[:op_pos if op_pos > 0 else len(rhs)]):
        dtype, dims = m.group(1), m.group(2)
        if dtype not in _BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dtype]
    return total


def audit_hlo(hlo_text: str) -> Dict[str, List[Tuple[int, str]]]:
    """Optimized HLO -> {collective op: [(result_bytes, instruction line), ...]}."""
    found: Dict[str, List[Tuple[int, str]]] = collections.defaultdict(list)
    for line in hlo_text.splitlines():
        s = line.strip()
        body = s.split(" = ", 1)[-1]
        for op in COLLECTIVE_OPS:
            # match the op at the start of the rhs (e.g. "all-reduce(", including
            # "all-gather-start("), not shape names or metadata
            if re.match(rf"(\(.*\)|\S+)\s*{op}(-start)?\(", body) or body.startswith(op):
                found[op].append((_result_bytes(s), s[:160]))
                break
    return dict(found)


# ------------------------------------------------------------------ DCN classification
_GROUPS_RE = re.compile(r"replica_groups=\{(\{[\d,{} ]*\})\}")
_IOTA_RE = re.compile(r"replica_groups=\[([\d,]+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?")
_PAIRS_RE = re.compile(r"source_target_pairs=\{((?:\{\d+,\d+\},?)*)\}")


def _parse_groups(line: str):
    """Device-id groups of a collective instruction, or None if not present.

    Handles explicit ``replica_groups={{0,4},{1,5}}``, the iota form
    ``replica_groups=[2,4]<=[8]`` (ids reshaped row-major; optional transpose
    ``<=[d0,d1]T(1,0)``), and collective-permute ``source_target_pairs`` (each pair is
    a 2-group)."""
    import numpy as np

    m = _GROUPS_RE.search(line)
    if m:
        return [[int(v) for v in g.split(",") if v.strip()]
                for g in re.findall(r"\{([\d, ]*)\}", m.group(1))]
    m = _IOTA_RE.search(line)
    if m:
        shape = [int(v) for v in m.group(1).split(",")]
        dims = [int(v) for v in m.group(2).split(",")]
        ids = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group(3):
            ids = ids.transpose([int(v) for v in m.group(3).split(",")])
        return ids.reshape(shape).tolist()
    m = _PAIRS_RE.search(line)
    if m:
        return [[int(a), int(b)] for a, b in re.findall(r"\{(\d+),(\d+)\}", m.group(1))]
    return None


def crosses_slices(line: str, slice_of: Dict[int, int]) -> bool:
    """True if any replica group / permute pair of this collective spans devices in
    different slices — i.e. the transfer rides DCN, not ICI (mesh.slice_of_device_map
    provides ``slice_of``). Unparseable/absent groups are conservatively DCN."""
    groups = _parse_groups(line)
    if groups is None:
        return True
    for g in groups:
        # unknown ids are conservative: each gets a unique pseudo-slice, so any group
        # containing one (or spanning real slices) classifies DCN
        if len({slice_of.get(d, f"?{d}") for d in g}) > 1:
            return True
    return False


def split_dcn_ici(hlo_text: str, slice_of: Dict[int, int]):
    """Optimized HLO -> {"dcn": {op: [(bytes, line)...]}, "ici": {...}} — the per-
    substrate traffic split for hybrid (multi-slice) meshes. DCN bandwidth is ~100x
    scarcer than ICI, so hybrid layouts are certified on the DCN bytes specifically.

    Cross-slice traffic takes TWO forms in XLA:TPU HLO (both classified DCN here):
      * ordinary collectives whose replica groups span slices, and
      * **MegaScale host transfers** — ``send``/``recv`` instructions with
        ``_xla_host_transfer_handler_name="xla_megascale_runtime"`` implementing the
        cross-slice leg of a hybrid collective (the within-slice legs stay as
        reduce-scatter/all-gather). Only ``send`` payload bytes are counted
        (recv is the same transfer arriving)."""
    dcn: Dict[str, List[Tuple[int, str]]] = collections.defaultdict(list)
    ici: Dict[str, List[Tuple[int, str]]] = collections.defaultdict(list)
    for line in hlo_text.splitlines():
        s = line.strip()
        body = s.split(" = ", 1)[-1]
        if "megascale" in s and re.match(r"(\(.*\)|\S+)\s*send\(", body):
            dcn["megascale-send"].append((_result_bytes(s), s[:160]))
            continue
        for op in COLLECTIVE_OPS:
            if re.match(rf"(\(.*\)|\S+)\s*{op}(-start)?\(", body) or body.startswith(op):
                target = dcn if crosses_slices(s, slice_of) else ici
                target[op].append((_result_bytes(s), s[:160]))
                break
    return {"dcn": dict(dcn), "ici": dict(ici)}


def audit_compiled(compiled) -> Dict[str, List[Tuple[int, str]]]:
    return audit_hlo(compiled.as_text())


def summarize(found: Dict[str, List[Tuple[int, str]]]) -> str:
    lines = []
    for op in tuple(COLLECTIVE_OPS) + tuple(k for k in found if k not in COLLECTIVE_OPS):
        entries = found.get(op, [])
        if not entries:
            continue
        total = sum(b for b, _ in entries)
        lines.append(f"{op:20s} x{len(entries):3d}  {total / 2**20:8.1f} MiB")
    return "\n".join(lines) if lines else "(no collectives)"


def _main():
    """Audit the flagship inference pipeline on a virtual 8-device CPU mesh."""
    import os

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.parallel import mesh as meshlib
    from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline, SVDPipelineConfig

    mesh = meshlib.make_mesh({"data": 2, "context": 4})
    pipe = StableVideoDiffusionPipeline(
        config=SVDPipelineConfig(height=192, width=320, num_frames=8,
                                 num_inference_steps=2, decode_chunk_size=4),
        unet_config=SVDUNetConfig(num_frames=8), dtype=jnp.bfloat16, mesh=mesh)
    with jax.set_mesh(mesh):
        params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
        img = jnp.zeros((1, 192, 320, 3), jnp.float32)
        compiled = jax.jit(pipe._generate_impl).lower(
            params, img, jax.random.PRNGKey(1)).compile()
    print("== inference denoise (data=2, context=4), 8f 192x320, full-size UNet")
    print(summarize(audit_compiled(compiled)))


if __name__ == "__main__":
    _main()
