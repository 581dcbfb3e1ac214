"""Static model configuration objects.

The reference encodes behavior in runtime class-swizzling (`patch/patch.py:719-817`),
peft adapter dicts, and checkpoint-directory-name flags (`utils/util.py:542-560`). Here all
of that is explicit, hashable, trace-time configuration: a model is fully described by its
config, and every variant (joint attention, LoRA routing, ControlNet, knowledge fusion)
compiles to a static XLA graph.
"""

from __future__ import annotations

import dataclasses
import fnmatch
from typing import Optional, Tuple

from lkgd_tpu.models.layers import LoraSpec


@dataclasses.dataclass(frozen=True)
class JointAttentionConfig:
    """Static description of the joint x<->y stream attention (reference
    `patch/patch.py:143-172,390-580`): a duplicated self-attention branch ``attn1n`` whose
    K/V come from the partner stream, followed by a zero-init post-projection, added to the
    main attention output scaled by ``joint_scale``.

    ``mask``: stream-level booleans; True rows are the "y" stream. Must have equal counts
    of 0s and 1s (the reference swaps them pairwise). For the CFG-doubled trans batch the
    reference uses [0,1,0,1] (`utils/util.py:606`).
    ``flip``: time-reverse the partner stream before cross-attending (trans training with
    flipped twins, `patch/patch.py:471-475`).
    """

    post: str = "conv"  # conv | scale | conv_fuse
    add_norm: bool = False
    flip: bool = False
    mask: Tuple[int, ...] = (0, 1)
    spatial: bool = True
    temporal: bool = False

    def __post_init__(self):
        if self.post not in ("conv", "scale", "conv_fuse"):
            raise ValueError(f"unknown post processing type {self.post}")
        if sum(self.mask) * 2 != len(self.mask):
            raise ValueError(f"joint mask must be balanced, got {self.mask}")

    @property
    def partner_perm(self) -> Tuple[int, ...]:
        """Permutation sending each stream to its partner (i-th 0-stream <-> i-th 1-stream),
        replicating the masked-scatter swap at `patch/patch.py:466-468`."""
        zeros = [i for i, m in enumerate(self.mask) if not m]
        ones = [i for i, m in enumerate(self.mask) if m]
        perm = [0] * len(self.mask)
        for a, b in zip(zeros, ones):
            perm[a], perm[b] = b, a
        return tuple(perm)


@dataclasses.dataclass(frozen=True)
class LoraRule:
    """Route an adapter onto projections whose diffusers-style path matches ``pattern``
    (fnmatch). ``streams`` is the static row mask (reference `set_patch_lora_mask`,
    `patch/patch.py:872-896`); inversion for joint K/V is applied by the block, not here."""

    pattern: str
    name: str
    rank: int = 4
    alpha: float = 4.0
    streams: Tuple[int, ...] = ()
    projections: Tuple[str, ...] = ("to_q", "to_k", "to_v")

    def matches(self, path: str, projection: str) -> bool:
        if projection not in self.projections:
            return False
        full = f"{path}.{projection}"
        return fnmatch.fnmatch(full, self.pattern) or self.pattern in full


@dataclasses.dataclass(frozen=True)
class LoraRouter:
    rules: Tuple[LoraRule, ...] = ()

    def resolve(self, path: str, projection: str, invert_streams: bool = False) -> Tuple[LoraSpec, ...]:
        specs = []
        for rule in self.rules:
            if rule.matches(path, projection):
                streams = rule.streams
                if invert_streams and streams:
                    streams = tuple(1 - int(s) for s in streams)
                specs.append(LoraSpec(name=rule.name, rank=rule.rank, alpha=rule.alpha, streams=streams))
        return tuple(specs)


EMPTY_ROUTER = LoraRouter()


@dataclasses.dataclass(frozen=True)
class SVDUNetConfig:
    """Config for UNetSpatioTemporalCondition (reference
    `models/unet_spatio_temporal_condition.py:72-97` + HF checkpoint config)."""

    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    layers_per_block: int = 2
    transformer_layers_per_block: int = 1
    # HF svd/svd-xt checkpoints use (5, 10, 20, 20); the reference class default is
    # (5, 10, 10, 20) but from_pretrained overrides it with the checkpoint value.
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    num_frames: int = 25
    sample_size: int = 96
    # GroupNorm eps inside spatio-temporal resblocks. The reference passes
    # resnet_eps=1e-5 (unet_spatio_temporal_condition.py:179,280) but diffusers'
    # get_down_block/get_up_block do NOT forward it to the SpatioTemporal block types —
    # each class body hard-codes its own value (a mix of 1e-5/1e-6). diffusers source is
    # unreachable in this environment (not installed, zero egress, no vendored copy —
    # verified r5), so the default is the uniform 1e-5 the original sgm/torch GroupNorm
    # training used, and the knobs below can express any diffusers per-block-type mix
    # for bit-parity work. Measured sensitivity (experiments/eps_sensitivity.py,
    # random-init worst case — zero-variance activations amplify eps): max |delta| =
    # 5.1% of output std in fp32; with trained weights (healthy activation variance)
    # the analytic scale is ~0.5*d(eps)/var ~ 4.5e-6 relative. Settle definitively via
    # cli/verify_parity record/check when real checkpoints are reachable.
    resnet_eps: float = 1e-5
    # override for CrossAttn{Down,Up}BlockSpatioTemporal resblocks (None -> resnet_eps)
    resnet_eps_cross: Optional[float] = None
    # override for the plain UpBlockSpatioTemporal resblocks (None -> resnet_eps)
    resnet_eps_up: Optional[float] = None

    # ---- LKGD extensions (all statically configured)
    knowledge_fusion: bool = False  # quaternion latent-knowledge fusion on the context
    joint: Optional[JointAttentionConfig] = None
    lora: LoraRouter = EMPTY_ROUTER
    dual_cond_conv_in: bool = False  # flow variant: second zero-alpha input conv (unet_..._flow.py:495-502)
    # joint x/y variant (unet_..._joint.py:251-279,483-500): a SECOND input head
    # (conv_in/time/add embeddings) whose rows are selected by this static stream mask
    # (True rows use the y head). None = single head.
    y_input_head_mask: Optional[Tuple[int, ...]] = None
    # gradient checkpointing: rematerialize each down/mid/up block in the backward pass
    # (reference enable_gradient_checkpointing, train_svd_lora.py:1181-1182)
    remat: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def halve_stream_masks(cfg: SVDUNetConfig) -> SVDUNetConfig:
    """The same UNet for a half (single-CFG-side) batch.

    Stream tuples (joint mask, LoRA row masks, y-head mask) describe the CFG-doubled
    stream-major batch ``[*uncond_streams, *cond_streams]``; a sequential-CFG call sees
    only one side, so tuples of even length >= 4 halve to their first half. The param
    tree is unchanged (masks are static routing, not parameters), so params initialized
    under either config are interchangeable."""

    def half(t):
        return t[: len(t) // 2] if t and len(t) >= 4 and len(t) % 2 == 0 else t

    joint = cfg.joint
    if joint is not None:
        joint = dataclasses.replace(joint, mask=half(joint.mask))
    lora = cfg.lora
    if lora.rules:
        lora = dataclasses.replace(lora, rules=tuple(
            dataclasses.replace(r, streams=half(r.streams)) for r in lora.rules))
    y_mask = cfg.y_input_head_mask
    if y_mask is not None:
        y_mask = half(y_mask)
    return dataclasses.replace(cfg, joint=joint, lora=lora, y_input_head_mask=y_mask)
