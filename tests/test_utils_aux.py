"""Aux utilities: DDIM inversion, control preprocessors, track helpers, flag parser."""

import numpy as np
import jax
import jax.numpy as jnp


def test_ddim_inversion_roundtrip():
    """Inverting with the true eps model then sampling back recovers the latents."""
    from lkgd_tpu.schedulers.cogvideox_ddim import CogVideoXDDIMScheduler
    from lkgd_tpu.pipelines.sd2d import sd_ddim_config
    from lkgd_tpu.utils.inversion import ddim_inversion

    sched = CogVideoXDDIMScheduler(sd_ddim_config())
    schedule = sched.set_timesteps(10)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8)).astype(np.float32)) * 0.3
    eps_const = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8)).astype(np.float32))

    # model that always predicts the SAME eps: inversion then DDIM sampling is exact
    noisy = ddim_inversion(lambda lat, t: eps_const, sched, schedule, x0)
    lat = noisy
    for i in range(schedule.num_steps):
        lat, _ = sched.step(schedule, eps_const, i, lat)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_control_preprocessors():
    from lkgd_tpu.utils.control_preprocess import control_preprocess, register_processor

    imgs = np.random.default_rng(0).uniform(size=(2, 32, 32, 3)).astype(np.float32)
    for kind in ("canny", "tile", "ip2p", "softedge"):
        out = control_preprocess(imgs, kind)
        assert out.shape[0] == 2 and out.shape[-1] == 3
        assert out.min() >= 0 and out.max() <= 1.0 + 1e-6
    register_processor("depth", lambda im: im * 0.5)
    out = control_preprocess(imgs, "depth")
    np.testing.assert_allclose(out, imgs * 0.5)


def test_track_helpers():
    from lkgd_tpu.utils.track_helpers import (
        draw_points, draw_tracks, filter_tracks_by_distance, grid_queries)

    q = grid_queries(4, 64, 64)
    assert q.shape == (16, 3)
    tracks = np.zeros((2, 3, 2), np.float32)
    tracks[1, 0] = [20, 20]  # only track 0 moves
    keep = filter_tracks_by_distance(tracks, min_dist=8.0)
    assert keep.tolist() == [True, False, False]
    pm = draw_points(32, 32, np.array([[16.0, 16.0]]))
    assert pm.shape == (32, 32, 4) and pm[16, 16, 3] > 0.9
    tm = draw_tracks(32, 32, tracks[:, :1])
    assert tm[..., 3].sum() > 0


def test_checkpoint_flag_parser():
    from lkgd_tpu.utils.inversion import parse_checkpoint_behavior_flags

    f = parse_checkpoint_behavior_flags("output_svdxt_translation_lora_noflip_temporal_nospatial/ckpt")
    assert f == {"flip": False, "temporal": True, "spatial": False}
    f2 = parse_checkpoint_behavior_flags("out_flip_temporal/ckpt")
    assert f2 == {"flip": True, "temporal": True, "spatial": True}
