"""Exact checkpoint key manifests for the published weights the porters target.

The reference loads these checkpoints with ``from_pretrained`` (e.g. SVD-xt in
`/root/reference/run_models/run_inference_trans_svd.py`, CogVideoX-5B-I2V in
`/root/reference/CogVideo-main/finetune/`): the torch ``state_dict`` names are fixed by
diffusers/transformers model code the reference imports unmodified
(`models/unet_spatio_temporal_condition.py:8-14` pulls blocks straight from
``diffusers.models``), plus the LKGD ``quaternion_lora_*`` fusion additions
(:197-225).

A manifest is ``{torch_key: shape}`` for one checkpoint. They are generated from our
model templates through the same export rules the porter inverts
(``porting.export_state_dict``), checked in as JSON under ``manifests/``, and tested
three ways (tests/test_manifests.py): the generator reproduces the checked-in file
(architecture drift alarm), the porter strictly consumes a state dict with exactly these
keys/shapes (end-to-end key compatibility), and parameter totals pin the published
model sizes exactly.

Regenerate after an architecture change:
  python -m lkgd_tpu.utils.checkpoint_manifest --write
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "manifests")


def zero_view_tree(shapes):
    """Shape tree -> tree of O(1)-memory zero arrays (broadcast views) for export."""
    return jax.tree.map(lambda l: np.broadcast_to(np.float32(0), tuple(l.shape)), shapes)


def manifest_from_template(shapes, export_key_map: Optional[Callable[[str], str]] = None
                           ) -> Dict[str, Tuple[int, ...]]:
    from lkgd_tpu.utils.porting import export_state_dict

    sd = export_state_dict(zero_view_tree(shapes), key_map=export_key_map)
    return {k: tuple(v.shape) for k, v in sd.items()}


# ------------------------------------------------------------------ model manifests
def svd_xt_unet_manifest(knowledge_fusion: bool = False) -> Dict[str, Tuple[int, ...]]:
    """stabilityai/stable-video-diffusion-img2vid-xt ``unet`` (1.524B params); with
    ``knowledge_fusion`` the LKGD ``quaternion_lora_*`` additions are included."""
    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
    from lkgd_tpu.utils.porting import svd_export_key_map

    cfg = SVDUNetConfig(num_frames=14, knowledge_fusion=knowledge_fusion)
    unet = UNetSpatioTemporalCondition(cfg)
    kw = {}
    if knowledge_fusion:
        kw = dict(domain_features=jnp.zeros((1, 1, 1000)),
                  flow_features=jnp.zeros((1, 1, 1000)))
    shapes = jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 14, 8, 8, 8)), jnp.zeros((1,)),
        jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)), **kw))
    return manifest_from_template(shapes, svd_export_key_map)


def svd_vae_manifest() -> Dict[str, Tuple[int, ...]]:
    """SVD ``vae`` — AutoencoderKLTemporalDecoder (97.7M params)."""
    from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder
    from lkgd_tpu.utils.porting import vae_export_key_map

    vae = AutoencoderKLTemporalDecoder()
    shapes = jax.eval_shape(lambda: vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), num_frames=1))
    return manifest_from_template(shapes, vae_export_key_map)


def clip_vit_h_manifest() -> Dict[str, Tuple[int, ...]]:
    """SVD ``image_encoder`` — CLIP ViT-H/14 vision tower + projection (632M params),
    in transformers naming (``vision_model.encoder.layers...``)."""
    from lkgd_tpu.models.clip_vision import CLIPVisionModelWithProjection
    from lkgd_tpu.utils.porting import clip_export_key_map

    clip = CLIPVisionModelWithProjection()
    shapes = jax.eval_shape(lambda: clip.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))))
    return manifest_from_template(shapes, clip_export_key_map)


def cogvideox_5b_manifest() -> Dict[str, Tuple[int, ...]]:
    """THUDM/CogVideoX-5b-I2V ``transformer`` in diffusers naming (~5.6B params)."""
    from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D
    from lkgd_tpu.utils.porting import cogvideox_export_key_map

    m = CogVideoXTransformer3D(CogVideoXConfig.cogvideox_5b_i2v(knowledge_fusion=False))
    shapes = jax.eval_shape(lambda: m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 60, 90, 32)),
        jnp.zeros((1, 226, 4096)), jnp.zeros((1,))))
    return manifest_from_template(shapes, cogvideox_export_key_map)


def raft_large_manifest() -> Dict[str, Tuple[int, ...]]:
    """torchvision ``raft_large`` (Raft_Large_Weights, ~5.3M params) — the reference's
    fallback flow estimator (`utils/flow_utils.py:18-64`)."""
    import jax.numpy as jnp

    from lkgd_tpu.models.raft import RAFT, RAFTConfig
    from lkgd_tpu.utils.porting import raft_export_key_map

    model = RAFT(RAFTConfig.large())
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), img, img))
    return manifest_from_template(shapes, raft_export_key_map)


GENERATORS = {
    "svd_xt_unet": svd_xt_unet_manifest,
    "svd_vae": svd_vae_manifest,
    "clip_vit_h": clip_vit_h_manifest,
    "cogvideox_5b_transformer": cogvideox_5b_manifest,
    "raft_large": raft_large_manifest,
}


def load_manifest(name: str) -> Dict[str, Tuple[int, ...]]:
    with open(os.path.join(MANIFEST_DIR, name + ".json")) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


def param_total(manifest: Dict[str, Tuple[int, ...]]) -> int:
    return sum(int(np.prod(s)) for s in manifest.values())


def synthetic_state_dict(manifest: Dict[str, Tuple[int, ...]]) -> Dict[str, np.ndarray]:
    """Zero-memory (broadcast-view) state dict with exactly the manifest's keys/shapes —
    feed to a porter with ``materialize=False`` for a full-coverage audit."""
    return {k: np.broadcast_to(np.float32(0), s) for k, s in manifest.items()}


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--write", action="store_true", help="(re)generate manifests/*.json")
    p.add_argument("--check", action="store_true", help="verify checked-in == generated")
    args = p.parse_args()
    os.makedirs(MANIFEST_DIR, exist_ok=True)
    for name, gen in GENERATORS.items():
        m = gen()
        path = os.path.join(MANIFEST_DIR, name + ".json")
        if args.write:
            with open(path, "w") as f:
                json.dump({k: list(v) for k, v in sorted(m.items())}, f, indent=0)
            print(f"{name}: {len(m)} keys, {param_total(m)/1e9:.4f}B params -> {path}")
        elif args.check:
            ok = load_manifest(name) == m
            print(f"{name}: {'OK' if ok else 'DRIFT'}")
            if not ok:
                raise SystemExit(1)
        else:
            print(f"{name}: {len(m)} keys, {param_total(m)/1e9:.4f}B params")


if __name__ == "__main__":
    main()
