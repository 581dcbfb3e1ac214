"""Composed-graph parity: the Flax ViT-B/16-384 (domain/flow MAE knowledge encoder) vs
an independent plain-torch transcription of timm's ``vit_base_patch16_384`` forward.

These encoders feed the LKGD quaternion fusion on the headline training path — the
reference runs two of them (typhoon domain + flow weights) per step and frame-averages
the head logits (`/root/reference/train_models/train_svd_lora.py:1406-1433,1455-1466`).
The torch side below is written from the timm vision_transformer spec (channels-first
patch conv, fused qkv with per-head reshape, pre-norm blocks, cls-token pooling,
classifier head) — not from our Flax code. Weights travel through
``export_state_dict(key_map=vit_export_key_map)`` in exact timm naming with
exactly-once consumption, so the test also audits the exporter/porter key coverage.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from lkgd_tpu.models.vit_mae import ViT, ViTConfig, encode_knowledge_features
from lkgd_tpu.utils.porting import export_state_dict, port_vit_mae, vit_export_key_map

from tests.torch_svd_unet_oracle import ParamStore

CFG = ViTConfig.tiny()
B = 2


def _randomize(params, seed=11, scale=0.2):
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(seed)
    new = [jnp.asarray(rng.normal(size=np.shape(l), scale=scale), jnp.float32)
           for l in leaves]
    return jax.tree.unflatten(treedef, new)


def _ln(p, prefix, x, eps):
    return F.layer_norm(x, (x.shape[-1],), p(prefix + ".weight"), p(prefix + ".bias"), eps)


def vit_forward(p: ParamStore, cfg: ViTConfig, pixel_values: torch.Tensor) -> torch.Tensor:
    """timm vision_transformer forward: NCHW pixels -> (B, num_classes) head logits."""
    x = F.conv2d(pixel_values, p("patch_embed.proj.weight"), p("patch_embed.proj.bias"),
                 stride=cfg.patch_size)
    b, d = x.shape[:2]
    x = x.flatten(2).transpose(1, 2)  # (B, N, D)
    x = torch.cat([p("cls_token").expand(b, -1, -1), x], dim=1)
    x = x + p("pos_embed")
    for i in range(cfg.depth):
        bp = f"blocks.{i}"
        h = _ln(p, bp + ".norm1", x, cfg.layer_norm_eps)
        s = h.shape[1]
        hd = d // cfg.num_heads
        qkv = h @ p(bp + ".attn.qkv.weight").t() + p(bp + ".attn.qkv.bias")
        q, k, v = qkv.reshape(b, s, 3, cfg.num_heads, hd).permute(2, 0, 3, 1, 4)
        o = torch.softmax((q * hd ** -0.5) @ k.transpose(-1, -2), dim=-1) @ v
        o = o.transpose(1, 2).reshape(b, s, d)
        x = x + (o @ p(bp + ".attn.proj.weight").t() + p(bp + ".attn.proj.bias"))
        h = _ln(p, bp + ".norm2", x, cfg.layer_norm_eps)
        h = F.gelu(h @ p(bp + ".mlp.fc1.weight").t() + p(bp + ".mlp.fc1.bias"),
                   approximate="none")
        h = h @ p(bp + ".mlp.fc2.weight").t() + p(bp + ".mlp.fc2.bias")
        x = x + h
    x = _ln(p, "norm", x, cfg.layer_norm_eps)
    return x[:, 0] @ p("head.weight").t() + p("head.bias")


class TestViTMAETorchOracle:
    def _setup(self):
        model = ViT(CFG, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((B, CFG.image_size, CFG.image_size, 3)).astype(
            np.float32)
        params = _randomize(model.init(jax.random.PRNGKey(0), jnp.asarray(pixels)))
        return model, params, pixels

    def test_composed_parity(self):
        model, params, pixels = self._setup()
        got = np.asarray(model.apply(params, jnp.asarray(pixels)))

        store = ParamStore(export_state_dict(params, key_map=vit_export_key_map))
        want = vit_forward(store, CFG,
                           torch.from_numpy(pixels.transpose(0, 3, 1, 2)).contiguous())
        assert store.unused() == [], f"exported but unconsumed: {store.unused()[:8]}"
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)

    def test_porter_roundtrip(self):
        """export (timm naming) -> port_vit_mae (strict) -> identical params; this is the
        exact naming the reference's MAE checkpoints carry after the ``encoder.`` strip
        (`train_svd_lora.py:1418-1424`)."""
        model, params, _ = self._setup()
        sd = export_state_dict(params, key_map=vit_export_key_map)
        back = port_vit_mae(sd, params, strict=True)
        for (pa, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(params)[0],
                                   jax.tree_util.tree_flatten_with_path(back)[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))

    def test_knowledge_features_frame_average(self):
        """encode_knowledge_features = per-frame head logits, mean over T with keepdim,
        matching the torch oracle composed with the reference's rearrange+mean
        (`train_svd_lora.py:1455-1466`)."""
        model, params, _ = self._setup()
        rng = np.random.default_rng(5)
        T = 3
        frames = rng.standard_normal((B, T, CFG.image_size, CFG.image_size, 3)).astype(
            np.float32)
        got = np.asarray(encode_knowledge_features(model, params, jnp.asarray(frames)))

        store = ParamStore(export_state_dict(params, key_map=vit_export_key_map))
        flat = torch.from_numpy(
            frames.reshape(B * T, *frames.shape[2:]).transpose(0, 3, 1, 2)).contiguous()
        want = vit_forward(store, CFG, flat).reshape(B, T, -1).mean(dim=1, keepdim=True)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)
