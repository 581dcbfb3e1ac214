"""Depth-Anything (DINOv2 + DPT) vs the HF torch implementation: full-model oracle on a
tiny config with real ported weights, porter key coverage against the real HF state-dict
naming, and the control_preprocess registry integration (VERDICT round-1 item #10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lkgd_tpu.models.depth_anything import (
    DepthAnything, DepthAnythingConfig, hf_depth_anything_key_map, make_depth_processor,
    normalize_pixels, port_depth_anything)

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _tiny_pair():
    """(hf_model, our_cfg) on a matched tiny architecture."""
    cfg = DepthAnythingConfig.tiny()
    backbone = transformers.Dinov2Config(
        image_size=cfg.image_size, patch_size=cfg.patch_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.depth, num_attention_heads=cfg.num_heads,
        out_indices=[i + 1 for i in cfg.out_indices], apply_layernorm=True,
        reshape_hidden_states=False)
    hf_cfg = transformers.DepthAnythingConfig(
        backbone_config=backbone, patch_size=cfg.patch_size,
        reassemble_hidden_size=cfg.hidden_size,
        neck_hidden_sizes=list(cfg.neck_hidden_sizes),
        fusion_hidden_size=cfg.fusion_hidden_size, head_hidden_size=cfg.head_hidden_size,
        depth_estimation_type="relative")
    hf = transformers.DepthAnythingForDepthEstimation(hf_cfg).eval()
    # break the symmetry of default-init weights
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in hf.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=gen))
    return hf, cfg


def test_matches_hf_torch_oracle():
    hf, cfg = _tiny_pair()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = port_depth_anything(state, cfg)

    r = np.random.default_rng(0)
    img = r.uniform(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    pix = np.asarray(normalize_pixels(jnp.asarray(img)))

    with torch.no_grad():
        ref = hf(torch.from_numpy(pix.transpose(0, 3, 1, 2))).predicted_depth.numpy()

    out = np.asarray(jax.jit(DepthAnything(cfg).apply)(params, jnp.asarray(pix)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_key_map_covers_real_state_dict():
    """Every flax param comes from a real HF key; no key-map entry is stale."""
    hf, cfg = _tiny_pair()
    hf_keys = set(hf.state_dict().keys())
    mapped = set(hf_depth_anything_key_map(cfg).keys())
    missing = mapped - hf_keys
    assert not missing, f"key map references keys absent from HF: {sorted(missing)[:5]}"
    # ported tree must exactly match the model's own init structure
    params = port_depth_anything({k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    init = DepthAnything(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    def shapes(tree):
        return {jax.tree_util.keystr(p): v.shape
                for p, v in jax.tree_util.tree_leaves_with_path(tree)}

    assert shapes(params) == shapes(init)


def test_registry_processor():
    """make_depth_processor output plugs into control_preprocess as 'depth'."""
    from lkgd_tpu.utils import control_preprocess as cp

    cfg = DepthAnythingConfig.tiny()
    model = DepthAnything(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    cp.register_processor("depth", make_depth_processor(params, cfg))
    frames = np.random.default_rng(1).uniform(size=(2, 40, 52, 3)).astype(np.float32)
    out = cp.control_preprocess(frames, "depth")
    assert out.shape == frames.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_matches_hf_torch_oracle_non_native_size():
    """Inputs off the native grid exercise interpolate_pos_encoding — the bicubic
    a=-0.75 half-pixel path (ops/resize.bicubic_resize) must match HF Dinov2."""
    hf, cfg = _tiny_pair()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = port_depth_anything(state, cfg)

    r = np.random.default_rng(1)
    h = cfg.image_size + 2 * cfg.patch_size   # different patch grid than native
    w = cfg.image_size - cfg.patch_size
    img = r.uniform(size=(1, h, w, 3)).astype(np.float32)
    pix = np.asarray(normalize_pixels(jnp.asarray(img)))

    with torch.no_grad():
        ref = hf(torch.from_numpy(pix.transpose(0, 3, 1, 2))).predicted_depth.numpy()

    out = np.asarray(jax.jit(DepthAnything(cfg).apply)(params, jnp.asarray(pix)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
