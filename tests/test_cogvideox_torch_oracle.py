"""Composed-graph parity: the Flax CogVideoX DiT vs an independent torch transcription
(tests/torch_cogvideox_oracle.py) with identical weights — the second-model-family
counterpart of tests/test_unet_torch_oracle.py.

Covers patch embedding (2D and 1.5's spatio-temporal), 3D RoPE and 2b's sincos
positions, adaLN-zero with the shared per-module LayerNorm, joint text∥video attention
with qk-layernorm, gelu-tanh FF over the joint stream, final adaLN, unpatchify, and the
quaternion+rFFT fusion at CogVideoX dimensions. Weights are randomized and travel
through export_state_dict(cogvideox_export_key_map); every exported tensor must be
consumed exactly once. Reference:
`/root/reference/CogVideo-main/finetune/models/cogvideox_i2v/cogvideox_transformer_3d.py`.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D
from lkgd_tpu.utils.porting import cogvideox_export_key_map, export_state_dict

from tests.torch_cogvideox_oracle import ParamStore, cogvideox_forward

B, T, H, W = 2, 4, 8, 8


def _randomize(params, seed=11, scale=0.15):
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(seed)
    return jax.tree.unflatten(treedef, [
        jnp.asarray(rng.normal(size=np.shape(l), scale=scale), jnp.float32)
        for l in leaves])


def _run(cfg, with_fusion):
    model = CogVideoXTransformer3D(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    sample = rng.standard_normal((B, T, H, W, cfg.in_channels)).astype(np.float32)
    text = rng.standard_normal((B, cfg.max_text_seq_length,
                                cfg.text_embed_dim)).astype(np.float32) * 0.3
    timestep = np.full((B,), 321.0, np.float32)
    kw = {}
    if with_fusion:
        dom = rng.standard_normal((B, 1, 48)).astype(np.float32)
        kw = dict(domain_features=dom, flow_features=dom * 0.5)

    params = _randomize(model.init(jax.random.PRNGKey(0), sample, text, timestep, **kw))
    got = np.asarray(model.apply(params, sample, text, timestep, **kw))

    store = ParamStore(export_state_dict(params, key_map=cogvideox_export_key_map))
    ocfg = dict(num_layers=cfg.num_layers, num_attention_heads=cfg.num_attention_heads,
                attention_head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
                patch_size_t=cfg.patch_size_t, out_channels=cfg.out_channels,
                text_embed_dim=cfg.text_embed_dim, use_rope=cfg.use_rope,
                spatial_interpolation_scale=cfg.spatial_interpolation_scale,
                temporal_interpolation_scale=cfg.temporal_interpolation_scale)
    want = cogvideox_forward(
        store, ocfg, torch.from_numpy(sample.transpose(0, 1, 4, 2, 3)).contiguous(),
        torch.from_numpy(text), torch.from_numpy(timestep),
        **({"domain": torch.from_numpy(kw["domain_features"]),
            "flow": torch.from_numpy(kw["flow_features"])} if with_fusion else {}))
    assert store.unused() == [], f"exported but unconsumed: {store.unused()[:8]}"
    want = want.numpy().transpose(0, 1, 3, 4, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestComposedCogVideoXParity:
    def test_i2v_rope_with_fusion(self):
        """Flagship: I2V channels, 3D RoPE, quaternion fusion on the T5 context."""
        _run(CogVideoXConfig.tiny(), with_fusion=True)

    def test_base_no_fusion(self):
        _run(CogVideoXConfig.tiny(knowledge_fusion=False), with_fusion=False)

    def test_2b_sincos_positions(self):
        """CogVideoX-2b variant: sincos 3D positions instead of RoPE."""
        cfg = dataclasses.replace(CogVideoXConfig.tiny(knowledge_fusion=False),
                                  use_rope=False)
        _run(cfg, with_fusion=False)

    def test_1_5_temporal_patching(self):
        """CogVideoX 1.5 variant: (pt, p, p) spatio-temporal patches."""
        cfg = dataclasses.replace(CogVideoXConfig.tiny(knowledge_fusion=False),
                                  patch_size_t=2)
        _run(cfg, with_fusion=False)
