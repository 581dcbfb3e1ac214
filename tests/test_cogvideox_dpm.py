"""CogVideoX DPM-Solver++ (SDE 2M) scheduler: schedule masks, perfect-model
convergence (the DDIM-roundtrip analog), final-step collapse to x0, and the pipeline
integration (reference cli_demo.py CogVideoXDPMScheduler + dynamic CFG path)."""

import numpy as np
import jax
import jax.numpy as jnp

from lkgd_tpu.schedulers.cogvideox_dpm import CogVideoXDPMScheduler


def test_schedule_second_order_mask():
    sched = CogVideoXDPMScheduler()
    s = sched.set_timesteps(10)
    ok = np.asarray(s.second_order_ok)
    assert not ok[0]  # no history yet
    assert not ok[-1]  # prev timestep < 0 (trailing spacing ends at t=99-..0 range)
    assert ok[1:-1].all()


def test_perfect_model_converges_to_x0():
    """With exact v-prediction for a known clean sample, the deterministic (z=0)
    sampler must land on x0 — and the final step collapses there exactly."""
    sched = CogVideoXDPMScheduler()
    s = sched.set_timesteps(25)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 2)), jnp.float32)

    x = jnp.asarray(np.random.default_rng(1).normal(size=x0.shape), jnp.float32)
    old = jnp.zeros_like(x)
    for i in range(s.num_steps):
        a_t = s.alphas_cumprod_t[i]
        # exact v for this x around the true x0: v = (sqrt(a) x - x0)/sqrt(1-a)
        v = (jnp.sqrt(a_t) * x - x0) / jnp.sqrt(1.0 - a_t)
        x, old = sched.step(s, v, old, i, x, noise=None)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_final_step_ignores_sample_scale():
    """acp_prev = 1 at the last step: the update must return exactly x0 regardless of
    the incoming sample (h = inf limit)."""
    sched = CogVideoXDPMScheduler()
    s = sched.set_timesteps(10)
    i = s.num_steps - 1
    a_t = s.alphas_cumprod_t[i]
    x0 = jnp.ones((1, 2, 2, 2)) * 0.3
    x = jnp.ones_like(x0) * 123.0
    v = (jnp.sqrt(a_t) * x - x0) / jnp.sqrt(1.0 - a_t)
    prev, _ = sched.step(s, v, jnp.zeros_like(x0), i, x, noise=None)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(x0), rtol=1e-5, atol=1e-5)


def test_pipeline_dpm_runs_and_differs_from_ddim():
    import dataclasses

    from lkgd_tpu.models.cogvideox import CogVideoXConfig
    from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                                  CogVideoXPipelineConfig)

    tcfg = CogVideoXConfig.tiny()
    base = CogVideoXPipelineConfig(height=32, width=32, num_frames=9,
                                   num_inference_steps=4)
    pipe_d = CogVideoXImageToVideoPipeline(base, tcfg, dtype=jnp.float32)
    params = pipe_d.init_params(jax.random.PRNGKey(0))
    prompt, img = jnp.ones((1, 8, 64)), jnp.ones((1, 4, 4, 4))
    lat_ddim = pipe_d(params, prompt, img)

    pipe_p = CogVideoXImageToVideoPipeline(
        dataclasses.replace(base, scheduler="dpm"), tcfg, dtype=jnp.float32)
    lat_dpm = pipe_p(params, prompt, img)
    assert lat_dpm.shape == lat_ddim.shape
    assert bool(jnp.isfinite(lat_dpm).all())
    assert np.abs(np.asarray(lat_dpm) - np.asarray(lat_ddim)).max() > 1e-4

    # same key -> bit-identical (explicit-PRNG determinism holds for the SDE sampler)
    lat_dpm2 = pipe_p(params, prompt, img)
    np.testing.assert_array_equal(np.asarray(lat_dpm), np.asarray(lat_dpm2))


def test_have_history_guard_ignores_stale_x0():
    """Mid-schedule starts (V2V SDEdit) have no x0 history: with have_history=False
    the update must be independent of whatever is in old_x0 (the reference's
    old_pred_original_sample-is-None first-order branch)."""
    sched = CogVideoXDPMScheduler()
    s = sched.set_timesteps(10)
    i = 5
    assert bool(s.second_order_ok[i])  # the mask alone would allow 2M here
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 2, 2)), jnp.float32)
    v = jnp.asarray(np.random.default_rng(1).normal(size=x.shape), jnp.float32)
    garbage1 = jnp.zeros_like(x)
    garbage2 = jnp.full_like(x, 37.0)
    a, _ = sched.step(s, v, garbage1, i, x, noise=None, have_history=False)
    bb, _ = sched.step(s, v, garbage2, i, x, noise=None, have_history=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    c, _ = sched.step(s, v, garbage2, i, x, noise=None, have_history=True)
    assert np.abs(np.asarray(c) - np.asarray(a)).max() > 1e-3


def test_v2v_dpm_pipeline_runs():
    from lkgd_tpu.models.cogvideox import CogVideoXConfig
    from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXPipelineConfig,
                                                  CogVideoXVideoToVideoPipeline)
    import dataclasses

    tcfg = dataclasses.replace(CogVideoXConfig.tiny(), in_channels=4)
    pcfg = CogVideoXPipelineConfig(height=32, width=32, num_frames=9,
                                   num_inference_steps=4, scheduler="dpm")
    pipe = CogVideoXVideoToVideoPipeline(pcfg, tcfg, dtype=jnp.float32, strength=0.5)
    params = pipe.init_params(jax.random.PRNGKey(0))
    vid = jnp.ones((1, 3, 4, 4, 4)) * 0.1
    lat = pipe(params, jnp.ones((1, 8, 64)), vid, rng=jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(lat).all())
