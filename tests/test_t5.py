"""T5 encoder vs transformers' torch T5EncoderModel (tiny config, random weights):
full-stack numerical oracle including relative position bias, RMSNorm, gated-GELU, and
attention masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lkgd_tpu.models.t5_text import T5Config, T5Encoder, port_t5_encoder


def _torch_t5(cfg: T5Config):
    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv, d_ff=cfg.d_ff,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0)
    torch.manual_seed(0)
    return transformers.T5EncoderModel(hf_cfg).eval()


def test_matches_transformers_torch():
    cfg = T5Config.tiny()
    ref = _torch_t5(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_t5_encoder(sd, cfg)
    model = T5Encoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 17)).astype(np.int32)
    mask = np.ones((2, 17), np.int32)
    mask[1, 9:] = 0
    with torch.no_grad():
        want = ref(input_ids=torch.tensor(ids, dtype=torch.long),
                   attention_mask=torch.tensor(mask, dtype=torch.long)
                   ).last_hidden_state.numpy()
    got = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    # masked-out positions are allowed to differ (torch zeroes nothing either, but
    # downstream consumers mask them); compare valid positions tightly
    np.testing.assert_allclose(np.asarray(got)[0], want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got)[1, :9], want[1, :9], rtol=2e-4, atol=2e-4)


def test_relative_bias_long_range_buckets():
    """Sequence longer than max_distance exercises the log-bucket branch."""
    cfg = T5Config.tiny()
    ref = _torch_t5(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_t5_encoder(sd, cfg)
    ids = np.tile(np.arange(100, dtype=np.int32)[None] % cfg.vocab_size, (1, 2))[:, :180]
    with torch.no_grad():
        want = ref(input_ids=torch.tensor(ids, dtype=torch.long)).last_hidden_state.numpy()
    got = T5Encoder(cfg).apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_embed_text_cli_tiny(tmp_path):
    """embed_text CLI smoke: prompts -> (B, L, D) .npy consumable by
    run_inference_cogvideox --prompt-embeds."""
    import os
    import sys

    import numpy as np

    out = str(tmp_path / "emb.npy")
    argv = sys.argv
    sys.argv = ["embed_text", "--tiny", "--prompt", "a girl riding a horse",
                "--prompt", "city at night", "--output", out]
    try:
        from lkgd_tpu.cli.embed_text import main
        main()
    finally:
        sys.argv = argv
    emb = np.load(out)
    assert emb.ndim == 3 and emb.shape[0] == 2
    assert np.isfinite(emb).all()
