"""Torch/diffusers checkpoint -> Flax param porting.

The reference loads HF checkpoints directly (`from_pretrained` everywhere, plus raw
state-dict surgery at `utils/util.py:585-593` and LoRA loads at :569-573). This module is
the TPU-side equivalent: rule-based key rewriting from torch naming to our param paths,
with shape-driven tensor transforms (linear transpose, conv OIHW->HWIO, temporal conv3d
(O,I,3,1,1)->(3,1,I,O), depthwise conv1d squeeze) and a strict coverage check — every
template leaf must be produced exactly once, every consumed torch key reported, making the
porter its own audit (SURVEY.md §7 "weight porting fidelity").

Entry points: ``port_state_dict(state_dict, template, prefix_map)`` plus model-specific
wrappers ``port_svd_unet`` / ``port_temporal_vae`` / ``port_clip_vision`` and the inverse
``export_state_dict`` (used by tests for bijective round-trips and by checkpoint export
for diffusers interop).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np

# module-list containers whose numeric children are flattened with '_' on our side
_LIST_RE = re.compile(
    r"\b(down_blocks|up_blocks|resnets|attentions|transformer_blocks|"
    r"temporal_transformer_blocks|downsamplers|upsamplers|blocks|controlnet_down_blocks|"
    r"layers)\.(\d+)")


def _flatten_lists(key: str) -> str:
    prev = None
    while prev != key:
        prev = key
        key = _LIST_RE.sub(lambda m: f"{m.group(1)}_{m.group(2)}", key)
    return key


def torch_key_to_path(key: str) -> Tuple[str, ...]:
    """Translate a diffusers/torch parameter name into our flax param path."""
    k = _flatten_lists(key)
    k = k.replace("to_out.0", "to_out")
    k = k.replace("ff.net.0.proj", "ff.net_0.proj")
    k = k.replace("ff.net.2", "ff.net_2")
    k = k.replace("ff_in.net.0.proj", "ff_in.net_0.proj")
    k = k.replace("ff_in.net.2", "ff_in.net_2")
    # attn1n & post-joint live under our "joint" submodule
    k = re.sub(r"\b(attn1n|conv1n|scale1n|norm1n)\b", r"joint.\1", k)
    parts = k.split(".")
    leaf = parts[-1]
    if leaf == "weight":
        parent = parts[-2] if len(parts) > 1 else ""
        if ("norm" in parent and not parent.endswith(("linear", "proj"))) or parent in (
                "group_norm",):
            leaf = "scale"
        elif parent in ("lconv", "dconv", "fconv"):
            leaf = "weight"  # depthwise compressors keep torch-style 'weight'
        else:
            leaf = "kernel"
    parts[-1] = leaf
    return tuple(parts)


def _fit_tensor(x: np.ndarray, target_shape: Tuple[int, ...],
                is_kernel: bool = False) -> Optional[np.ndarray]:
    """Find the canonical torch->flax layout transform matching the target shape.

    ``is_kernel``: the target is a Dense/Conv kernel — torch layout ALWAYS transposes
    even when square (shape alone cannot disambiguate)."""
    x = np.asarray(x)
    if is_kernel and x.ndim == 2:
        return x.T if x.T.shape == tuple(target_shape) else None
    if is_kernel and x.ndim == 4:
        t = x.transpose(2, 3, 1, 0)
        return t if t.shape == tuple(target_shape) else None
    if x.shape == tuple(target_shape):
        return x
    if x.ndim == 2 and x.T.shape == tuple(target_shape):
        return x.T  # torch Linear (out, in) -> (in, out)
    if x.ndim == 4 and x.transpose(2, 3, 1, 0).shape == tuple(target_shape):
        return x.transpose(2, 3, 1, 0)  # Conv2d OIHW -> HWIO
    if x.ndim == 5 and x.shape[3:] == (1, 1):
        t = x[:, :, :, 0, 0].transpose(2, 1, 0)[:, None]  # Conv3d (O,I,3,1,1) -> (3,1,I,O)
        if t.shape == tuple(target_shape):
            return t
    if x.ndim == 3 and x.shape[-1] == 1:
        t = x[:, :, 0]  # Conv1d (O, G, 1) -> depthwise compressor (O, G)
        if t.shape == tuple(target_shape):
            return t
        if t.T.shape == tuple(target_shape):
            return t.T
    if x.ndim == 1 and tuple(target_shape) == x.shape:
        return x
    # torch LoRA A: (r, in) -> (in, r); B: (out, r) -> (r, out) — both 2D transposes
    return None


def _template_leaves(template) -> Dict[Tuple[str, ...], Tuple[Tuple[int, ...], np.dtype]]:
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    out = {}
    for path, leaf in flat:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        out[keys] = (tuple(leaf.shape), leaf.dtype)
    return out


def port_state_dict(state_dict: Dict[str, np.ndarray], template,
                    key_map: Optional[Callable[[str], Optional[str]]] = None,
                    strict: bool = True, materialize: bool = True):
    """Build a params pytree shaped like ``template`` from a torch state dict.

    ``key_map``: optional pre-translation hook (rename/drop torch keys; return None to
    skip a key). Raises on unmatched template leaves or unconsumed torch keys if strict.
    ``materialize=False`` runs the full key/shape audit (same failures) but skips the
    dtype-cast copies and returns None — an O(1)-memory coverage check usable against
    full-size checkpoint manifests.
    """
    leaves = _template_leaves(template)
    produced: Dict[Tuple[str, ...], np.ndarray] = {}
    unused = []
    for key, tensor in state_dict.items():
        mapped = key_map(key) if key_map else key
        if mapped is None:
            continue
        path = ("params",) + torch_key_to_path(mapped)
        if path not in leaves:
            unused.append(key)
            continue
        if path[-1] == "tkernel":  # torch ConvTranspose2d (in, out, kh, kw)
            t = np.asarray(tensor).transpose(2, 3, 0, 1)
            fitted = t if t.shape == leaves[path][0] else None
        else:
            fitted = _fit_tensor(np.asarray(tensor), leaves[path][0],
                                 is_kernel=(path[-1] == "kernel"))
        if fitted is None:
            raise ValueError(f"{key}: cannot fit shape {np.shape(tensor)} into "
                             f"{leaves[path][0]} at {'/'.join(path)}")
        produced[path] = fitted.astype(leaves[path][1]) if materialize else fitted

    missing = [p for p in leaves if p not in produced]
    if strict and (missing or unused):
        msg = []
        if missing:
            msg.append(f"missing {len(missing)} params, e.g. " +
                       ", ".join("/".join(p) for p in missing[:5]))
        if unused:
            msg.append(f"unused {len(unused)} torch keys, e.g. " + ", ".join(unused[:5]))
        raise ValueError("; ".join(msg))
    if not materialize:
        return None

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in flat:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        new_leaves.append(produced.get(keys, np.asarray(leaf)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def export_state_dict(params, key_map: Optional[Callable[[str], str]] = None,
                      path_predicate: Optional[Callable[[str], bool]] = None
                      ) -> Dict[str, np.ndarray]:
    """Inverse of port_state_dict: our params -> torch-layout state dict (diffusers
    naming), for checkpoint interop (reference exports LoRA safetensors in diffusers
    layout, `train_svd_lora.py:1736-1747`). ``path_predicate`` filters by '/'-joined
    flax param path (e.g. export only adapters)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys and keys[0] == "params":
            keys = keys[1:]
        if path_predicate is not None and not path_predicate("/".join(keys)):
            continue
        x = np.asarray(leaf)
        leafname = keys[-1]
        if leafname == "kernel":
            if x.ndim == 2:
                x = x.T
            elif x.ndim == 4 and x.shape[:2] == (3, 1):
                # (3,1,I,O) temporal conv -> torch Conv3d (O,I,3,1,1); genuine 1-wide
                # spatial kernels like SepConvGRU's (5,1) stay 4D Conv2d layout
                x = x.transpose(3, 2, 0, 1)[..., None]
            elif x.ndim == 4:
                x = x.transpose(3, 2, 0, 1)
            keys[-1] = "weight"
        elif leafname == "scale":
            keys[-1] = "weight"
        name = ".".join(keys)
        # restore torch list naming and to_out.0 / ff.net indices
        name = re.sub(
            r"\b(down_blocks|up_blocks|resnets|attentions|transformer_blocks|"
            r"temporal_transformer_blocks|downsamplers|upsamplers|blocks|"
            r"controlnet_down_blocks|layers)_(\d+)", r"\1.\2", name)
        name = name.replace("joint.", "")
        name = re.sub(r"\bto_out\b", "to_out.0", name)
        name = name.replace("ff.net_0.proj", "ff.net.0.proj").replace("ff.net_2", "ff.net.2")
        name = name.replace("ff_in.net_0.proj", "ff_in.net.0.proj").replace("ff_in.net_2", "ff_in.net.2")
        if key_map:
            name = key_map(name)
        out[name] = x
    return out


# ---------------------------------------------------------------- model-specific wrappers
def svd_unet_key_map(key: str) -> Optional[str]:
    """diffusers UNetSpatioTemporalConditionModel + LKGD additions -> our paths."""
    # LKGD quaternion fusion modules (reference unet :197-225)
    if key.startswith("quaternion_lora_"):
        name = key[len("quaternion_lora_"):]
        name = name.replace("fuse_sf.0", "fuse_sf_0").replace("fuse_sf.2", "fuse_sf_2")
        return f"knowledge_fusion.{name}"
    return key


def port_svd_unet(state_dict, template, strict: bool = True):
    return port_state_dict(state_dict, template, key_map=svd_unet_key_map, strict=strict)


def vae_key_map(key: str) -> Optional[str]:
    """diffusers AutoencoderKLTemporalDecoder -> our paths."""
    k = key
    k = k.replace("mid_block.resnets.", "mid_block_resnets_")
    k = k.replace("mid_block.attentions.", "mid_block_attentions_")
    k = re.sub(r"up_blocks\.(\d+)\.resnets\.(\d+)", r"up_blocks_\1_resnets_\2", k)
    k = re.sub(r"up_blocks\.(\d+)\.upsamplers\.0\.conv", r"up_blocks_\1_upsamplers_0", k)
    k = re.sub(r"down_blocks\.(\d+)\.downsamplers\.0\.conv", r"down_blocks.\1.downsamplers_0", k)
    # the decoder's SpatioTemporalResBlock AlphaBlender: our param sits directly on the
    # block (models/vae_temporal.py mix_factor), diffusers nests it under time_mixer
    k = k.replace(".time_mixer.mix_factor", ".mix_factor")
    return k


def port_temporal_vae(state_dict, template, strict: bool = True):
    return port_state_dict(state_dict, template, key_map=vae_key_map, strict=strict)


def clip_key_map(key: str) -> Optional[str]:
    """transformers CLIPVisionModelWithProjection -> our paths."""
    k = key
    if k.startswith("vision_model."):
        k = k[len("vision_model."):]
    k = k.replace("encoder.layers.", "layers.")
    k = k.replace("embeddings.", "")
    k = k.replace("self_attn.", "").replace("mlp.", "")
    if k == "class_embedding":
        return "class_embedding"
    if k == "position_embedding.weight":
        return "position_embedding"
    if k == "patch_embedding.weight":
        return "patch_embedding.weight"
    return k


def port_clip_vision(state_dict, template, strict: bool = True):
    return port_state_dict(state_dict, template, key_map=clip_key_map, strict=strict)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Any checkpoint file (.safetensors / .npz / torch .bin/.pth/.pt) -> flat
    name->ndarray dict. The single loader behind every porter CLI (annotate, caption,
    compute_metrics, verify_parity); unwraps torch Lightning-style nested
    ``{"state_dict": ...}`` containers."""
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


# ---------------------------------------------------------------- LoRA adapter interop
def lora_key_map(adapter_name: str):
    """diffusers/peft LoRA state-dict names -> our in-kernel adapter params.

    Accepts 'unet.<path>.to_q.lora_A.weight' (diffusers), with optional
    'base_model.model.' / 'unet.' prefixes and peft '...lora_A.<adapter>.weight' forms
    (reference loads these at utils/util.py:569-573 via load_lora_into_unet).
    """

    def map_key(key: str):
        k = key
        for prefix in ("base_model.model.", "unet.", "transformer."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        k = k.replace(f".lora_A.{adapter_name}.weight", f".lora_A.weight")
        k = k.replace(f".lora_B.{adapter_name}.weight", f".lora_B.weight")
        # kohya style
        k = k.replace(".lora.down.weight", ".lora_A.weight")
        k = k.replace(".lora.up.weight", ".lora_B.weight")
        if k.endswith(".lora_A.weight"):
            return k[: -len(".lora_A.weight")] + f".lora_{adapter_name}_A"
        if k.endswith(".lora_B.weight"):
            return k[: -len(".lora_B.weight")] + f".lora_{adapter_name}_B"
        return None  # not a lora tensor

    return map_key


def port_lora_safetensors(state_dict, template, adapter_name: str, strict: bool = False):
    """Load a diffusers-layout LoRA safetensors dict into a params tree whose router
    already declares the adapter (non-adapter leaves keep the template values)."""
    return port_state_dict(state_dict, template, key_map=lora_key_map(adapter_name),
                           strict=strict)


def export_lora_safetensors(params, adapter_name: str):
    """Our adapter params -> diffusers-layout LoRA state dict
    (reference exports per-adapter safetensors at train_svd_lora.py:1736-1747)."""
    sd = export_state_dict(
        params, path_predicate=lambda p: f"lora_{adapter_name}_" in p)
    out = {}
    for k, v in sd.items():
        k2 = k.replace(f".lora_{adapter_name}_A", ".lora_A.weight")
        k2 = k2.replace(f".lora_{adapter_name}_B", ".lora_B.weight")
        out["unet." + k2] = v.T  # back to torch (out, in) layout
    return out


def cogvideox_key_map(key: str) -> Optional[str]:
    """diffusers CogVideoXTransformer3DModel (+ LKGD quaternion additions) -> our paths."""
    k = key
    if k.startswith("quaternion_lora_"):
        name = k[len("quaternion_lora_"):]
        name = name.replace("fuse_sf.0", "fuse_sf_0").replace("fuse_sf.2", "fuse_sf_2")
        return f"knowledge_fusion.{name}"
    k = k.replace("patch_embed.proj", "patch_embed_proj")
    k = k.replace("patch_embed.text_proj", "patch_embed_text_proj")
    k = k.replace("norm_out.linear", "norm_out_linear")
    k = k.replace("norm_out.norm", "norm_out_norm")
    k = re.sub(r"\bff\.net\.0\.proj\b", "ff_0", k)
    k = re.sub(r"\bff\.net\.2\b", "ff_2", k)
    return k


def port_cogvideox(state_dict, template, strict: bool = True):
    return port_state_dict(state_dict, template, key_map=cogvideox_key_map, strict=strict)


# ---------------------------------------------------------------- export-side key maps
# (inverses of the import maps above: our canonical export names -> the exact names in
# the published checkpoints; used by export_state_dict key_map= and by the checkpoint
# manifests in utils/checkpoint_manifest.py)
def svd_export_key_map(key: str) -> str:
    """Our export naming -> LKGD/diffusers SVD checkpoint naming (quaternion fusion
    modules live at top level as ``quaternion_lora_*``, reference unet :197-225)."""
    if key.startswith("knowledge_fusion."):
        k = key[len("knowledge_fusion."):]
        k = k.replace("fuse_sf_0", "fuse_sf.0").replace("fuse_sf_2", "fuse_sf.2")
        return "quaternion_lora_" + k
    return key


def cogvideox_export_key_map(key: str) -> str:
    """Our export naming -> diffusers CogVideoXTransformer3DModel checkpoint naming."""
    k = key.replace("patch_embed_proj", "patch_embed.proj")
    k = k.replace("patch_embed_text_proj", "patch_embed.text_proj")
    k = k.replace("norm_out_linear", "norm_out.linear")
    k = k.replace("norm_out_norm", "norm_out.norm")
    k = k.replace(".ff_0.", ".ff.net.0.proj.").replace(".ff_2.", ".ff.net.2.")
    return svd_export_key_map(k)


def vae_export_key_map(key: str) -> str:
    """Our export naming (post generic list restore) -> diffusers
    AutoencoderKLTemporalDecoder checkpoint naming."""
    k = key.replace("mid_block_resnets_", "mid_block.resnets.")
    k = k.replace("mid_block_attentions_", "mid_block.attentions.")
    # generic restore already turned up_blocks_N into up_blocks.N; the rest of the
    # flattened decoder name (_resnets_M / _upsamplers_0) it cannot see
    k = re.sub(r"up_blocks\.(\d+)_resnets_(\d+)", r"up_blocks.\1.resnets.\2", k)
    k = re.sub(r"up_blocks\.(\d+)_upsamplers_0", r"up_blocks.\1.upsamplers.0.conv", k)
    k = re.sub(r"down_blocks\.(\d+)\.downsamplers\.0\b", r"down_blocks.\1.downsamplers.0.conv", k)
    k = re.sub(r"(resnets\.\d+)\.mix_factor", r"\1.time_mixer.mix_factor", k)
    return k


def clip_export_key_map(key: str) -> str:
    """Our export naming -> transformers CLIPVisionModelWithProjection naming."""
    k = key
    if k.startswith("layers."):
        parts = k.split(".")
        rest = ".".join(parts[2:])
        if rest.startswith(("q_proj", "k_proj", "v_proj", "out_proj")):
            rest = "self_attn." + rest
        elif rest.startswith(("fc1", "fc2")):
            rest = "mlp." + rest
        return f"vision_model.encoder.layers.{parts[1]}.{rest}"
    if k == "class_embedding":
        return "vision_model.embeddings.class_embedding"
    if k == "position_embedding":
        return "vision_model.embeddings.position_embedding.weight"
    if k.startswith("patch_embedding"):
        return "vision_model.embeddings.patch_embedding.weight"
    if k.startswith(("pre_layrnorm", "post_layernorm")):
        return f"vision_model.{k}"
    return k  # visual_projection.*


def rife_key_map(key: str) -> Optional[str]:
    """RIFE v3-HD flownet.pkl -> our IFNet paths (reference rife/IFNet_HDv3.py:39-117).

    torch Sequential indices: conv0.A.{0=Conv2d,1=PReLU}, convblockA.B.{0,1},
    conv1/conv2.{0=deconv,1=PReLU,2=deconv}. The teacher block (block_tea) is
    training-only distillation state and is dropped.
    """
    if key.startswith("module."):
        key = key[len("module."):]
    if key.startswith("block_tea") or key.startswith(("contextnet", "unet")):
        return None
    m = re.match(r"^(block\d+)\.conv0\.(\d)\.(\d)\.(weight|bias)$", key)
    if m:
        b, a, i, leaf = m.groups()
        return (f"{b}.conv0_{a}.conv.{leaf}" if i == "0" else f"{b}.conv0_{a}.alpha")
    m = re.match(r"^(block\d+)\.convblock(\d)\.(\d)\.(\d)\.(weight|bias)$", key)
    if m:
        b, a, c, i, leaf = m.groups()
        return (f"{b}.convblock{a}_{c}.conv.{leaf}" if i == "0"
                else f"{b}.convblock{a}_{c}.alpha")
    m = re.match(r"^(block\d+)\.(conv[12])\.(\d)\.(weight|bias)$", key)
    if m:
        b, head, i, leaf = m.groups()
        tleaf = "tkernel" if leaf == "weight" else "bias"
        if i == "0":
            return f"{b}.{head}_0.conv.{tleaf}"
        if i == "1":
            return f"{b}.{head}_0.alpha"
        return f"{b}.{head}_1.{tleaf}"
    return key


def port_rife(state_dict, template, strict: bool = True):
    """Port a RIFE v3-HD ``flownet.pkl`` state dict into an ``IFNet`` template."""
    return port_state_dict(state_dict, template, key_map=rife_key_map, strict=strict)


# ---------------------------------------------------------------- RAFT (torchvision)
def raft_key_map(key: str) -> Optional[str]:
    """torchvision ``raft_large`` state dict -> our ``models/raft.py`` paths.

    Naming derived from torchvision's models/optical_flow/raft.py (Conv2dNormActivation
    Sequential indices: .0 conv / .1 norm; recurrent_block.convgru{1,2}; separate
    top-level mask_predictor). BatchNorm buffers become frozen ``norm*_{mean,var}``
    params; feature-encoder InstanceNorm has no parameters. Reference usage:
    `utils/flow_utils.py:18-64`."""
    if "num_batches_tracked" in key:
        return None
    k = key
    k = re.sub(r"\blayer(\d)\.(\d)\b", r"layer\1_\2", k)
    # residual-block Conv2dNormActivation pairs
    for i in ("1", "2"):
        k = k.replace(f"convnormrelu{i}.0", f"conv{i}")
        k = re.sub(rf"convnormrelu{i}\.1\.(weight|bias|running_mean|running_var)",
                   lambda m, i=i: f"norm{i}_" + {"weight": "scale", "bias": "bias",
                                                 "running_mean": "mean",
                                                 "running_var": "var"}[m.group(1)], k)
    # encoder stem
    k = k.replace("convnormrelu.0", "conv1")
    k = re.sub(r"convnormrelu\.1\.(weight|bias|running_mean|running_var)",
               lambda m: "norm1_" + {"weight": "scale", "bias": "bias",
                                     "running_mean": "mean",
                                     "running_var": "var"}[m.group(1)], k)
    k = k.replace("downsample.0", "downsample")
    k = re.sub(r"downsample\.1\.(weight|bias|running_mean|running_var)",
               lambda m: "norm3_" + {"weight": "scale", "bias": "bias",
                                     "running_mean": "mean",
                                     "running_var": "var"}[m.group(1)], k)
    k = re.sub(r"\b(feature_encoder|context_encoder)\.conv\.", r"\1.conv2.", k)
    k = k.replace("update_block.motion_encoder.conv.0.", "update_block.conv.")
    k = re.sub(r"update_block\.motion_encoder\.(conv(?:corr|flow)\d)\.0\.",
               r"update_block.\1.", k)
    k = re.sub(r"update_block\.recurrent_block\.convgru(\d)\.conv([zrq])\.",
               r"update_block.conv\g<2>\g<1>.", k)
    k = re.sub(r"update_block\.flow_head\.conv(\d)\.", r"update_block.flow_head_conv\1.", k)
    k = k.replace("mask_predictor.convrelu.0.", "mask_conv1.")
    k = k.replace("mask_predictor.conv.", "mask_conv2.")
    return k


def raft_export_key_map(key: str) -> str:
    """Inverse of raft_key_map (our export naming -> torchvision raft_large naming)."""
    k = key
    k = re.sub(r"\blayer(\d)_(\d)\b", r"layer\1.\2", k)
    k = k.replace("mask_conv1.", "mask_predictor.convrelu.0.")
    k = k.replace("mask_conv2.", "mask_predictor.conv.")
    k = re.sub(r"update_block\.flow_head_conv(\d)\.", r"update_block.flow_head.conv\1.", k)
    k = re.sub(r"update_block\.conv([zrq])(\d)\.",
               r"update_block.recurrent_block.convgru\2.conv\1.", k)
    k = re.sub(r"update_block\.(conv(?:corr|flow)\d)\.",
               r"update_block.motion_encoder.\1.0.", k)
    k = k.replace("update_block.conv.", "update_block.motion_encoder.conv.0.")
    k = re.sub(r"\b(feature_encoder|context_encoder)\.conv2\.", r"\1.conv.", k)
    norm_leaf = {"scale": "weight", "weight": "weight", "bias": "bias", "mean":
                 "running_mean", "var": "running_var"}
    # norms: numbered convnormrelu{1,2} inside residual blocks, bare convnormrelu at the
    # encoder stem, downsample.1 for the shortcut norm
    k = re.sub(r"(layer\d\.\d\.)norm([12])_(scale|weight|bias|mean|var)$",
               lambda m: m.group(1) + f"convnormrelu{m.group(2)}.1." + norm_leaf[m.group(3)], k)
    k = re.sub(r"(encoder\.)norm1_(scale|weight|bias|mean|var)$",
               lambda m: m.group(1) + "convnormrelu.1." + norm_leaf[m.group(2)], k)
    k = re.sub(r"norm3_(scale|weight|bias|mean|var)$",
               lambda m: "downsample.1." + norm_leaf[m.group(1)], k)
    # residual-block convs vs the encoder stem conv1 (no layer segment)
    k = re.sub(r"(layer\d\.\d\.)conv([12])\.", r"\1convnormrelu\2.0.", k)
    k = re.sub(r"\b(feature_encoder|context_encoder)\.conv1\.", r"\1.convnormrelu.0.", k)
    k = re.sub(r"(layer\d\.\d\.)downsample\.weight$", r"\1downsample.0.weight", k)
    return k


def port_raft(state_dict, template, strict: bool = True, materialize: bool = True):
    """Port a torchvision raft_large state dict into a ``models/raft.py`` RAFT template."""
    return port_state_dict(state_dict, template, key_map=raft_key_map, strict=strict,
                           materialize=materialize)


# ---------------------------------------------------------------- 2D SD UNet
def unet2d_key_map(key: str) -> Optional[str]:
    """diffusers SD2 UNet2DConditionModel -> our models/unet_2d.py paths.

    Our 2D module names are flat single-level ("down_blocks_0_resnets_0"), unlike the
    SVD UNet's nested blocks, so the generic list flattening is not enough (the
    reference loads SD2/inpaint checkpoints via from_pretrained for the 8 SD-2D
    pipelines, e.g. `pipeline/pipeline_stable_diffusion_inpaint.py`)."""
    k = re.sub(r"\b(down_blocks|up_blocks)\.(\d+)\.(resnets|attentions|downsamplers|"
               r"upsamplers)\.(\d+)\.", r"\1_\2_\3_\4.", key)
    k = k.replace("mid_block.resnets.", "mid_block_resnets_")
    k = k.replace("mid_block.attentions.", "mid_block_attentions_")
    if k.startswith(("class_embedding", "add_embedding")):
        return None  # SD2 variants without class/add embeddings
    return k


def port_unet_2d(state_dict, template, strict: bool = True):
    return port_state_dict(state_dict, template, key_map=unet2d_key_map, strict=strict)


def unet2d_export_key_map(key: str) -> str:
    """Inverse: our export naming -> diffusers SD2 UNet naming (the generic list
    restore only reaches the first underscore group of the flat names)."""
    k = re.sub(r"\b(down_blocks|up_blocks)\.(\d+)_(resnets|attentions|downsamplers|"
               r"upsamplers)_(\d+)", r"\1.\2.\3.\4", key)
    k = k.replace("mid_block_resnets_", "mid_block.resnets.")
    k = k.replace("mid_block_attentions_", "mid_block.attentions.")
    return k


def vit_export_key_map(key: str) -> str:
    """Our export naming -> timm ``vit_base_patch16_384`` state-dict naming (the inverse
    of ``lkgd_tpu.models.vit_mae.timm_vit_key_map``). The reference loads these exact
    names from MAE checkpoints' ``encoder.*`` keys
    (`/root/reference/train_models/train_svd_lora.py:1406-1433`)."""
    k = key
    if k.startswith("patch_embed."):
        k = k.replace("patch_embed.", "patch_embed.proj.")
    if k.startswith("blocks."):
        k = k.replace(".qkv.", ".attn.qkv.").replace(".proj.", ".attn.proj.")
        k = k.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
    return k


def port_vit_mae(state_dict, template, strict: bool = True):
    """timm/MAE ``encoder.*``-stripped state dict -> our ViT params."""
    from lkgd_tpu.models.vit_mae import timm_vit_key_map

    return port_state_dict(state_dict, template, key_map=timm_vit_key_map, strict=strict)
