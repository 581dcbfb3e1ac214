"""Checkpoint-manifest integrity: the checked-in manifests regenerate bit-identically
from the model templates (architecture-drift alarm), the porters strictly consume state
dicts with exactly those keys/shapes (real-checkpoint key compatibility, VERDICT r1 #5),
known published key names are present, and parameter totals are pinned exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lkgd_tpu.utils import checkpoint_manifest as cm
from lkgd_tpu.utils import porting


@pytest.mark.parametrize("name", sorted(cm.GENERATORS))
def test_manifest_matches_checked_in(name):
    assert cm.load_manifest(name) == cm.GENERATORS[name](), \
        f"architecture drift: regenerate with python -m lkgd_tpu.utils.checkpoint_manifest --write"


def test_known_diffusers_keys_present():
    """Spot checks against names fixed by the diffusers/transformers model code the
    reference imports (models/unet_spatio_temporal_condition.py:8-14 et al.)."""
    m = cm.load_manifest("svd_xt_unet")
    for k in [
        "conv_in.weight", "conv_in.bias",
        "time_embedding.linear_1.weight", "time_embedding.linear_2.bias",
        "add_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.spatial_res_block.norm1.weight",
        "down_blocks.0.resnets.0.temporal_res_block.conv1.weight",
        "down_blocks.0.resnets.0.time_mixer.mix_factor",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.attentions.0.temporal_transformer_blocks.0.attn1.to_out.0.weight",
        "down_blocks.0.attentions.0.time_pos_embed.linear_1.weight",
        "down_blocks.0.attentions.0.time_mixer.mix_factor",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.3.resnets.1.spatial_res_block.conv2.weight",
        "mid_block.attentions.0.norm.weight",
        "mid_block.resnets.1.temporal_res_block.time_emb_proj.weight",
        "up_blocks.0.resnets.2.spatial_res_block.conv_shortcut.weight",
        "up_blocks.3.attentions.2.transformer_blocks.0.norm3.weight",
        "conv_norm_out.weight", "conv_out.weight",
    ]:
        assert k in m, k
    # conv_in consumes 8 latent channels (4 noise + 4 image cond), kernel 3x3, 320 out
    assert m["conv_in.weight"] == (320, 8, 3, 3)
    assert m["down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"] == (320, 1024)

    v = cm.load_manifest("svd_vae")
    for k in ["encoder.conv_in.weight", "decoder.time_conv_out.weight",
              "quant_conv.weight",
              "decoder.up_blocks.0.resnets.0.spatial_res_block.conv1.weight",
              "decoder.up_blocks.0.resnets.0.temporal_res_block.conv1.weight",
              "decoder.up_blocks.0.resnets.0.time_mixer.mix_factor",
              "decoder.mid_block.resnets.0.time_mixer.mix_factor",
              "encoder.down_blocks.0.resnets.0.norm1.weight",
              "encoder.down_blocks.0.downsamplers.0.conv.weight",
              "encoder.mid_block.attentions.0.to_q.weight"]:
        assert k in v, k

    c = cm.load_manifest("clip_vit_h")
    for k in ["vision_model.embeddings.class_embedding",
              "vision_model.embeddings.patch_embedding.weight",
              "vision_model.embeddings.position_embedding.weight",
              "vision_model.encoder.layers.31.self_attn.q_proj.weight",
              "vision_model.encoder.layers.0.mlp.fc1.weight",
              "vision_model.post_layernorm.weight", "visual_projection.weight"]:
        assert k in c, k
    assert c["visual_projection.weight"] == (1024, 1280)

    g = cm.load_manifest("cogvideox_5b_transformer")
    for k in ["patch_embed.proj.weight", "patch_embed.text_proj.weight",
              "transformer_blocks.41.attn1.to_q.weight",
              "transformer_blocks.0.norm1.linear.weight",
              "transformer_blocks.0.ff.net.0.proj.weight",
              "transformer_blocks.0.ff.net.2.weight",
              "norm_out.linear.weight", "proj_out.weight",
              "time_embedding.linear_1.weight"]:
        assert k in g, k
    assert g["patch_embed.text_proj.weight"] == (3072, 4096)
    assert g["transformer_blocks.41.attn1.to_q.weight"] == (3072, 3072)


def test_param_totals_pinned_exactly():
    assert cm.param_total(cm.load_manifest("svd_xt_unet")) == 1_524_623_082
    assert cm.param_total(cm.load_manifest("svd_vae")) == 97_742_847
    assert cm.param_total(cm.load_manifest("clip_vit_h")) == 632_076_800
    assert cm.param_total(cm.load_manifest("cogvideox_5b_transformer")) == 5_570_473_536


@pytest.mark.parametrize("name", ["svd_vae", "clip_vit_h"])
def test_porter_consumes_full_manifest_audit(name):
    """Full-size coverage audit in O(1) memory (materialize=False): every manifest key
    must land on exactly one template leaf with a fitting shape, nothing missing,
    nothing unused."""
    if name == "svd_vae":
        from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder

        model = AutoencoderKLTemporalDecoder()
        shapes = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), num_frames=1))
        key_map = porting.vae_key_map
    else:
        from lkgd_tpu.models.clip_vision import CLIPVisionModelWithProjection

        model = CLIPVisionModelWithProjection()
        shapes = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))))
        key_map = porting.clip_key_map
    sd = cm.synthetic_state_dict(cm.load_manifest(name))
    porting.port_state_dict(sd, shapes, key_map=key_map, strict=True, materialize=False)


def test_porter_consumes_svd_unet_manifest_audit():
    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition

    unet = UNetSpatioTemporalCondition(SVDUNetConfig(num_frames=14))
    shapes = jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 14, 8, 8, 8)), jnp.zeros((1,)),
        jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3))))
    sd = cm.synthetic_state_dict(cm.load_manifest("svd_xt_unet"))
    porting.port_state_dict(sd, shapes, key_map=porting.svd_unet_key_map,
                            strict=True, materialize=False)


def test_porter_consumes_cogvideox_manifest_audit():
    from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D

    m = CogVideoXTransformer3D(CogVideoXConfig.cogvideox_5b_i2v(knowledge_fusion=False))
    shapes = jax.eval_shape(lambda: m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 60, 90, 32)),
        jnp.zeros((1, 226, 4096)), jnp.zeros((1,))))
    sd = cm.synthetic_state_dict(cm.load_manifest("cogvideox_5b_transformer"))
    porting.port_state_dict(sd, shapes, key_map=porting.cogvideox_key_map,
                            strict=True, materialize=False)
