"""BLIP captioner vs the transformers torch oracle (random tiny config).

Verifies the porter consumes the exact HF ``BlipForConditionalGeneration`` state-dict
schema and that forward logits match at fp32 tolerance (the reference's ``blip_cap``,
utils/util.py:310-329, runs this HF model).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

transformers = pytest.importorskip("transformers")

from lkgd_tpu.models.blip import (  # noqa: E402
    BlipCaptioner, BlipConfig, greedy_caption, port_blip, preprocess_images)

TINY = BlipConfig(image_size=32, patch_size=8, vision_hidden=48, vision_layers=2,
                  vision_heads=2, vision_intermediate=96, vocab_size=64, text_hidden=32,
                  text_layers=2, text_heads=2, text_intermediate=64,
                  max_position_embeddings=32, bos_token_id=60, sep_token_id=61,
                  pad_token_id=0)


def _torch_tiny():
    cfg = transformers.BlipConfig(
        text_config=transformers.BlipTextConfig(
            vocab_size=TINY.vocab_size, hidden_size=TINY.text_hidden,
            num_hidden_layers=TINY.text_layers, num_attention_heads=TINY.text_heads,
            intermediate_size=TINY.text_intermediate,
            max_position_embeddings=TINY.max_position_embeddings,
            encoder_hidden_size=TINY.vision_hidden, bos_token_id=TINY.bos_token_id,
            sep_token_id=TINY.sep_token_id, pad_token_id=TINY.pad_token_id).to_dict(),
        vision_config=transformers.BlipVisionConfig(
            hidden_size=TINY.vision_hidden, num_hidden_layers=TINY.vision_layers,
            num_attention_heads=TINY.vision_heads,
            intermediate_size=TINY.vision_intermediate, image_size=TINY.image_size,
            patch_size=TINY.patch_size).to_dict())
    torch.manual_seed(0)
    return transformers.BlipForConditionalGeneration(cfg).eval()


def test_logits_match_torch_oracle():
    net = _torch_tiny()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = port_blip(sd, TINY)

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(1, TINY.vocab_size - 4, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = net(pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2),
                  input_ids=torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(BlipCaptioner(TINY).apply(params, jnp.asarray(pixels),
                                                jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_greedy_caption_matches_torch_generate():
    net = _torch_tiny()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = port_blip(sd, TINY)

    pixels = np.random.default_rng(1).normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_ids = net.generate(torch.from_numpy(pixels).permute(0, 3, 1, 2),
                               max_length=8, num_beams=1, do_sample=False)[0].numpy()
    ours = greedy_caption(BlipCaptioner(TINY), params, jnp.asarray(pixels),
                          max_length=8)[0]
    # compare up to the first SEP (ours pads after SEP, HF stops)
    ref_trim = [t for t in ref_ids.tolist()[1:] if t != TINY.pad_token_id]
    our_trim = []
    for t in ours.tolist()[1:]:
        our_trim.append(t)
        if t == TINY.sep_token_id:
            break
    assert our_trim[: len(ref_trim)] == ref_trim[: len(our_trim)]


def test_preprocess_shapes():
    imgs = np.random.default_rng(0).uniform(size=(2, 40, 60, 3)).astype(np.float32)
    out = preprocess_images(imgs, image_size=32)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
