"""Chained-flow point tracker (utils/point_tracker.py) — synthetic-motion oracle.

The tracker's math (grid queries, bilinear flow sampling, flow chaining,
forward-backward visibility) is verified against exact synthetic flows injected via
``flow_fn``; the RAFT integration is shape/NaN-smoked with a tiny random model.
Reference analog: CoTracker annotation (utils/util.py:441-504)."""

import jax.numpy as jnp
import numpy as np

from lkgd_tpu.utils.point_tracker import (_sample_bilinear, grid_queries,
                                          make_track_fn, track_video)


def test_grid_queries_layout():
    q = grid_queries(64, 128, 4)
    assert q.shape == (16, 2)
    # margin = 64 // 4 // 2 = 8; row-major, xy order
    assert np.allclose(q[0], [8, 8])
    assert np.allclose(q[-1], [120, 56])
    assert (q[:, 0] <= 127).all() and (q[:, 1] <= 63).all()


def test_bilinear_sampling_exact_on_linear_field():
    # a field linear in x and y is reproduced exactly by bilinear interpolation
    h, w = 8, 10
    yy, xx = np.mgrid[0:h, 0:w]
    field = jnp.asarray(np.stack([2.0 * xx + 1.0, -3.0 * yy], -1), jnp.float32)
    pts = jnp.asarray([[1.5, 2.25], [0.0, 0.0], [8.9, 6.1]], jnp.float32)
    out = np.asarray(_sample_bilinear(field, pts))
    np.testing.assert_allclose(out[:, 0], 2.0 * np.asarray(pts)[:, 0] + 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[:, 1], -3.0 * np.asarray(pts)[:, 1], rtol=1e-5)


def _const_flow(dx, dy, consistent=True):
    def fn(f1, f2):
        h, w = f1.shape[1:3]
        fwd = jnp.broadcast_to(jnp.asarray([dx, dy], jnp.float32), (1, h, w, 2))
        bwd = -fwd if consistent else jnp.zeros_like(fwd)
        return fwd, bwd

    return fn


def test_constant_translation_tracks_linearly():
    frames = jnp.zeros((5, 32, 32, 3))
    queries = jnp.asarray([[4.0, 4.0], [16.0, 8.0]], jnp.float32)
    fn = make_track_fn(None, None, flow_fn=_const_flow(2.0, 1.0))
    tracks, vis = fn(frames, queries)
    assert tracks.shape == (5, 2, 2) and vis.shape == (5, 2)
    for t in range(5):
        np.testing.assert_allclose(np.asarray(tracks[t]),
                                   np.asarray(queries) + t * np.asarray([2.0, 1.0]),
                                   rtol=1e-5)
    assert bool(np.asarray(vis).all())


def test_point_leaving_frame_goes_invisible():
    frames = jnp.zeros((6, 16, 16, 3))
    queries = jnp.asarray([[12.0, 8.0]], jnp.float32)  # exits right edge after 1 step
    fn = make_track_fn(None, None, flow_fn=_const_flow(4.0, 0.0))
    _, vis = fn(frames, queries)
    v = np.asarray(vis)[:, 0]
    assert v[0] and not v[2:].any(), v  # clamped samples keep x at the edge -> invisible


def test_inconsistent_backward_flow_marks_occluded():
    frames = jnp.zeros((3, 32, 32, 3))
    queries = jnp.asarray([[8.0, 8.0]], jnp.float32)
    fn = make_track_fn(None, None, flow_fn=_const_flow(2.0, 0.0, consistent=False))
    tracks, vis = fn(frames, queries)
    v = np.asarray(vis)
    assert v[0, 0] and not v[1:, 0].any()
    # positions still integrate through occlusion
    np.testing.assert_allclose(np.asarray(tracks[-1, 0]), [12.0, 8.0], rtol=1e-5)


def test_raft_integration_smoke():
    import jax

    from lkgd_tpu.models.raft import RAFT, RAFTConfig

    cfg = RAFTConfig(iters=2)
    model = RAFT(cfg, dtype=jnp.float32)
    frames = np.random.default_rng(0).uniform(size=(3, 32, 40, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 40, 3)),
                        jnp.zeros((1, 32, 40, 3)))
    tracks, vis = track_video(model, params, frames, grid_size=3)
    assert tracks.shape == (3, 9, 2) and vis.shape == (3, 9)
    assert np.isfinite(tracks).all()
