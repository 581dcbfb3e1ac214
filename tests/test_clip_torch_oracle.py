"""Composed-graph parity: the Flax CLIP vision tower (+projection) vs an independent
plain-torch transcription with identical exported weights.

This is the conditioning encoder of the headline SVD path — the reference runs
transformers' ``CLIPVisionModelWithProjection`` (laion CLIP-ViT-H-14) on the antialiased
224^2 input and feeds ``image_embeds`` into cross-attention
(`/root/reference/pipeline/pipeline_stable_video_diffusion_trans.py:140,157-203`). Until
now its evidence was param counts + porter round-trips; here the whole tower — patch
conv, class/pos embeddings, pre-LN, N pre-norm attention/MLP layers, pooled post-LN,
bias-free visual projection — must agree numerically at fp32 through one composed
forward, with every exported tensor consumed exactly once (transformers naming, so the
oracle doubles as a name-coverage audit of ``clip_export_key_map``).

The torch side is written from the transformers CLIPVisionModelWithProjection spec
(channels-first conv, explicit per-head attention loop-free reshape), not from our Flax
code, so layout/wiring bugs cannot be mirrored.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from lkgd_tpu.models.clip_vision import (CLIPVisionConfig, CLIPVisionModelWithProjection,
                                         clip_normalize)
from lkgd_tpu.utils.porting import clip_export_key_map, export_state_dict, port_clip_vision

from tests.torch_svd_unet_oracle import ParamStore

CFG = CLIPVisionConfig.tiny()
B = 2


def _randomize(params, seed=3, scale=0.2):
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(seed)
    new = [jnp.asarray(rng.normal(size=np.shape(l), scale=scale), jnp.float32)
           for l in leaves]
    return jax.tree.unflatten(treedef, new)


def _ln(p, prefix, x, eps):
    return F.layer_norm(x, (x.shape[-1],), p(prefix + ".weight"), p(prefix + ".bias"), eps)


def _attention(p, prefix, x, num_heads):
    b, s, d = x.shape
    hd = d // num_heads
    q = x @ p(prefix + ".q_proj.weight").t() + p(prefix + ".q_proj.bias")
    k = x @ p(prefix + ".k_proj.weight").t() + p(prefix + ".k_proj.bias")
    v = x @ p(prefix + ".v_proj.weight").t() + p(prefix + ".v_proj.bias")
    q = q.reshape(b, s, num_heads, hd).transpose(1, 2) * hd ** -0.5
    k = k.reshape(b, s, num_heads, hd).transpose(1, 2)
    v = v.reshape(b, s, num_heads, hd).transpose(1, 2)
    o = torch.softmax(q @ k.transpose(-1, -2), dim=-1) @ v
    o = o.transpose(1, 2).reshape(b, s, d)
    return o @ p(prefix + ".out_proj.weight").t() + p(prefix + ".out_proj.bias")


def clip_vision_forward(p: ParamStore, cfg: CLIPVisionConfig,
                        pixel_values: torch.Tensor) -> torch.Tensor:
    """transformers CLIPVisionModelWithProjection: NCHW pixels -> (B, projection_dim)."""
    emb = "vision_model.embeddings."
    x = F.conv2d(pixel_values, p(emb + "patch_embedding.weight"),
                 stride=cfg.patch_size)  # (B, D, g, g)
    b, d = x.shape[:2]
    x = x.flatten(2).transpose(1, 2)  # (B, g*g, D)
    cls = p(emb + "class_embedding").expand(b, 1, d)
    x = torch.cat([cls, x], dim=1)
    x = x + p(emb + "position_embedding.weight")[None]
    x = _ln(p, "vision_model.pre_layrnorm", x, cfg.layer_norm_eps)
    for i in range(cfg.num_layers):
        lp = f"vision_model.encoder.layers.{i}"
        x = x + _attention(p, lp + ".self_attn",
                           _ln(p, lp + ".layer_norm1", x, cfg.layer_norm_eps),
                           cfg.num_heads)
        h = _ln(p, lp + ".layer_norm2", x, cfg.layer_norm_eps)
        h = h @ p(lp + ".mlp.fc1.weight").t() + p(lp + ".mlp.fc1.bias")
        h = F.gelu(h, approximate="none")
        h = h @ p(lp + ".mlp.fc2.weight").t() + p(lp + ".mlp.fc2.bias")
        x = x + h
    pooled = _ln(p, "vision_model.post_layernorm", x[:, 0], cfg.layer_norm_eps)
    return pooled @ p("visual_projection.weight").t()


class TestCLIPVisionTorchOracle:
    def _setup(self):
        model = CLIPVisionModelWithProjection(CFG, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((B, CFG.image_size, CFG.image_size, 3)).astype(
            np.float32)
        params = _randomize(model.init(jax.random.PRNGKey(0), jnp.asarray(pixels)))
        return model, params, pixels

    def test_composed_parity(self):
        model, params, pixels = self._setup()
        got = np.asarray(model.apply(params, jnp.asarray(pixels)))

        store = ParamStore(export_state_dict(params, key_map=clip_export_key_map))
        want = clip_vision_forward(
            store, CFG, torch.from_numpy(pixels.transpose(0, 3, 1, 2)).contiguous())
        assert store.unused() == [], f"exported but unconsumed: {store.unused()[:8]}"
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)

    def test_porter_roundtrip(self):
        """export -> port_clip_vision (strict) -> identical params: the exporter and the
        HF-checkpoint porter are exact inverses on transformers naming."""
        model, params, _ = self._setup()
        sd = export_state_dict(params, key_map=clip_export_key_map)
        back = port_clip_vision(sd, params, strict=True)
        for (pa, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(params)[0],
                                   jax.tree_util.tree_flatten_with_path(back)[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))

    def test_preprocess_chain_matches_torch(self):
        """clip_normalize vs the reference's feature-extractor normalize
        (`pipeline...trans.py:190-196`: rescale to [0,1] then (x-mean)/std)."""
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(1, 8, 8, 3)).astype(np.float32)
        got = np.asarray(clip_normalize(jnp.asarray(img)))
        mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
        np.testing.assert_allclose(got, (img - mean) / std, rtol=1e-6)
