"""SegFormer segmentation annotator: HF torch oracle parity + processor smoke.

Reference analog: `/root/reference/annotate/annotate_segmentation.py` (segmentation
pseudo-labels for ControlNet conditioning; the reference imports OneFormer from an
external repo — this is the in-framework backend for the same registry slot).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lkgd_tpu.models.segformer import (SegformerConfig, SegformerForSemanticSegmentation,
                                       make_segmentation_processor, port_segformer)


def test_matches_hf_segformer():
    torch = pytest.importorskip("torch")
    from transformers import SegformerConfig as HFConfig
    from transformers import SegformerForSemanticSegmentation as HFModel

    cfg = SegformerConfig.tiny()
    hf_cfg = HFConfig(
        num_channels=3, num_encoder_blocks=4, depths=list(cfg.depths),
        sr_ratios=list(cfg.sr_ratios), hidden_sizes=list(cfg.hidden_sizes),
        patch_sizes=list(cfg.patch_sizes), strides=list(cfg.strides),
        num_attention_heads=list(cfg.num_heads), mlp_ratios=[cfg.mlp_ratio] * 4,
        hidden_act="gelu", decoder_hidden_size=cfg.decoder_hidden,
        num_labels=cfg.num_labels, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0)
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    model = SegformerForSemanticSegmentation(cfg)
    x = np.random.default_rng(0).normal(size=(1, 64, 96, 3)).astype(np.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = port_segformer(sd, shapes, strict=True)

    out = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = hf(torch.tensor(x).permute(0, 3, 1, 2)).logits  # (B, L, H/4, W/4)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_segmentation_processor_smoke():
    cfg = SegformerConfig.tiny()
    model = SegformerForSemanticSegmentation(cfg)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img0)
    proc = make_segmentation_processor(params, cfg)
    img = (np.random.default_rng(1).uniform(size=(50, 70, 3)) * 255).astype(np.uint8)
    seg = proc(img)
    assert seg.shape == (50, 70, 3) and seg.dtype == np.uint8
    # deterministic palette: same input -> identical map
    np.testing.assert_array_equal(seg, proc(img))
