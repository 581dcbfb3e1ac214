"""Serving artifacts (jax.export StableHLO packaging): export -> deserialize ->
serve-from-artifact-only, and the deserialized program must match the live pipeline
bit-for-bit given the same params and seed."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


pytestmark = pytest.mark.slow  # whole-pipeline jax.export compiles (~2-3 min)

def test_export_roundtrip_matches_live(tmp_path):
    from jax import export as jexport

    from lkgd_tpu.cli.export_serving import export_cogvideox, load_and_smoke
    from lkgd_tpu.models.cogvideox import CogVideoXConfig
    from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                                  CogVideoXPipelineConfig)

    art = str(tmp_path / "art")
    export_cogvideox(art, tiny=True)
    load_and_smoke(art)  # artifact-only serving path

    with open(f"{art}/denoise.stablehlo", "rb") as f:
        prog = jexport.deserialize(f.read())

    tcfg = CogVideoXConfig.tiny()
    # exporter default is the dpm sampler (matches the serving CLI) — the live
    # pipeline for the bit-match must use the same
    pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=9,
                                   num_inference_steps=2, scheduler="dpm",
                                   vae_scale_factor_spatial=4)
    pipe = CogVideoXImageToVideoPipeline(pcfg, tcfg, dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(3))
    prompt = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 64)), jnp.float32)
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 4)), jnp.float32)

    got = prog.call(params, prompt, img, jnp.uint32(7))
    want = pipe._generate_impl(params, prompt, jnp.zeros_like(prompt), img,
                               jax.random.PRNGKey(jnp.uint32(7)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_export_svd_and_serve(tmp_path):
    from lkgd_tpu.cli.export_serving import export_svd, load_and_smoke

    art = str(tmp_path / "svd_art")
    export_svd(art, tiny=True)
    frames = load_and_smoke(art)
    assert jnp.asarray(frames).shape == (1, 4, 64, 64, 3)
