"""DeepCache opt-in serving accelerator (arXiv:2312.00858; SVDUNetConfig has no
reference analog — the reference serves the exact pipeline only).

Contract under test:
  * exactness: full(x) == cached(x, feature_of(full(x))) bit-for-bit — the cached path
    recomputes exactly the shallow level and splices the cache where the deep trunk was
  * pipeline semantics: deep_cache_interval=1 is the untouched exact path;
    interval>1 runs end-to-end, differs from exact (it is an approximation), and
    interval==num_steps caches everything after step 0
  * guards: sequential_cfg + deep cache is rejected; ControlNet residuals with
    deep_cache raise
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lkgd_tpu.models.configs import SVDUNetConfig
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition

TINY = dict(block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlockSpatioTemporal",
                              "DownBlockSpatioTemporal"),
            up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
            layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=32)


def _unet_io():
    cfg = SVDUNetConfig(num_frames=2, **TINY)
    unet = UNetSpatioTemporalCondition(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 16, 8))
    ts = jnp.zeros((1,))
    ehs = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 32)) * 0.1
    ids = jnp.ones((1, 3))
    params = unet.init(jax.random.PRNGKey(0), x, ts, ehs, ids)
    return unet, params, x, ts, ehs, ids


def test_cached_step_is_exact_for_same_step_feature():
    unet, params, x, ts, ehs, ids = _unet_io()
    out_full, feat = unet.apply(params, x, ts, ehs, ids, return_deep_feature=True)
    out_cached = unet.apply(params, x, ts, ehs, ids, deep_cache=feat)
    np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_cached))


def test_cached_step_tracks_current_shallow_path():
    unet, params, x, ts, ehs, ids = _unet_io()
    _, feat = unet.apply(params, x, ts, ehs, ids, return_deep_feature=True)
    x2 = x + 0.3
    approx = np.asarray(unet.apply(params, x2, ts, ehs, ids, deep_cache=feat))
    exact = np.asarray(unet.apply(params, x2, ts, ehs, ids))
    stale = np.asarray(unet.apply(params, x, ts, ehs, ids))
    assert not np.array_equal(approx, exact)  # it IS an approximation
    # but it responds to the new latents (closer to fresh shallow than frozen output)
    assert np.abs(approx - stale).max() > 1e-3


def test_controlnet_residuals_rejected_with_cache():
    unet, params, x, ts, ehs, ids = _unet_io()
    _, feat = unet.apply(params, x, ts, ehs, ids, return_deep_feature=True)
    with pytest.raises(ValueError, match="ControlNet"):
        unet.apply(params, x, ts, ehs, ids, deep_cache=feat,
                   mid_block_additional_residual=jnp.zeros((1,)))


def _tiny_pipe(**over):
    from lkgd_tpu.models.clip_vision import CLIPVisionConfig
    from lkgd_tpu.models.vae_temporal import TemporalVAEConfig
    from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline, SVDPipelineConfig

    pcfg = SVDPipelineConfig(height=32, width=32, num_frames=2, num_inference_steps=4,
                             decode_chunk_size=2, **over)
    return StableVideoDiffusionPipeline(
        config=pcfg, unet_config=SVDUNetConfig(num_frames=2, **TINY),
        vae_config=TemporalVAEConfig(block_out_channels=(32, 64), layers_per_block=1),
        clip_config=CLIPVisionConfig.tiny(), dtype=jnp.float32)


def test_pipeline_deep_cache_end_to_end():
    pipe_exact = _tiny_pipe()
    pipe_dc = _tiny_pipe(deep_cache_interval=2)
    params = pipe_exact.init_params(jax.random.PRNGKey(0))
    img = jnp.ones((1, 32, 32, 3)) * 0.5
    rng = jax.random.PRNGKey(1)
    lat_exact = pipe_exact._generate(params, img, rng)
    lat_dc = pipe_dc._generate(params, img, rng)
    assert lat_dc.shape == lat_exact.shape
    assert np.isfinite(np.asarray(lat_dc)).all()
    assert not np.array_equal(np.asarray(lat_dc), np.asarray(lat_exact))
    # outputs stay in the same distributional ballpark (approximation, not garbage)
    assert np.abs(np.asarray(lat_dc)).mean() < 10 * np.abs(np.asarray(lat_exact)).mean()


def test_sequential_cfg_conflict_rejected():
    pipe = _tiny_pipe(deep_cache_interval=2, sequential_cfg=True)
    params = pipe.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="mutually"):
        pipe._generate_impl(params, jnp.ones((1, 32, 32, 3)) * 0.5,
                            jax.random.PRNGKey(1))
