"""Chained-flow point tracker — the TrackDataset pseudo-label producer.

The reference annotates videos with CoTracker (torch.hub ``facebookresearch/co-tracker``;
query construction at `/root/reference/utils/util.py:441-504`
``get_points_on_a_grid``/``get_track_queries``) and the track trainers
(`train_models/train_track_lora_joint.py`) consume ``(T, N, 2)`` pixel tracks.
CoTracker's weights live entirely outside the reference repo (hub download), so this is
deliberately NOT a CoTracker port: it is the classical dense-tracking construction —
chain per-pair optical flow from the in-tree RAFT (`models/raft.py`, torchvision
raft_large layout) with bilinear flow sampling at sub-pixel track positions, and mark
visibility by forward-backward consistency + in-bounds checks. Emits
TrackDataset-compatible ``.npz`` files ('tracks' (T, N, 2) xy, 'visibility' (T, N)) via
``cli/annotate.py --annotation tracks``.

The whole T-frame chain is ONE ``lax.scan`` over frame pairs inside ONE jit — static
shapes, RAFT's fixed iteration count unrolled, bidirectional flow batched (2, H, W, 3)
per step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grid_queries(height: int, width: int, grid_size: Tuple[int, int] | int,
                 margin: Optional[float] = None) -> np.ndarray:
    """(N, 2) xy query points on a uniform grid (reference ``get_points_on_a_grid``,
    utils/util.py:441-483: margin defaults to one cell half-height, points row-major)."""
    if isinstance(grid_size, int):
        grid_size = (grid_size, grid_size)
    gh, gw = grid_size
    if margin is None:
        margin = height // gh // 2
    ys = np.linspace(margin, height - margin, gh)
    xs = np.linspace(margin, width - margin, gw)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx, gy], axis=-1).reshape(-1, 2).astype(np.float32)


def _sample_bilinear(field: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample (H, W, C) at (N, 2) xy positions (clamped) -> (N, C)."""
    h, w = field.shape[:2]
    x = jnp.clip(pts[:, 0], 0.0, w - 1.0)
    y = jnp.clip(pts[:, 1], 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    f00 = field[y0, x0]
    f01 = field[y0, x0 + 1]
    f10 = field[y0 + 1, x0]
    f11 = field[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * f00 + fx * f01)
            + fy * ((1 - fx) * f10 + fx * f11))


def make_track_fn(model, params, fb_thresh: float = 2.0, flow_fn=None):
    """Jitted ``(frames (T, H, W, 3) in [0,1], queries (N, 2)) -> (tracks, visibility)``.

    tracks (T, N, 2) xy float32; visibility (T, N) bool. A point goes invisible when the
    forward-backward flow cycle error exceeds ``fb_thresh`` px or it leaves the frame;
    positions keep integrating flow regardless (re-appearing points re-validate), the
    standard chained-flow occlusion handling.

    ``flow_fn(f1 (1,H,W,3), f2) -> (fwd (1,H,W,2), bwd)`` overrides the RAFT flow —
    the synthetic-motion oracle tests inject exact flows here."""
    from lkgd_tpu.models.raft import raft_bidirectional_flow

    if flow_fn is None:
        flow_fn = lambda f1, f2: raft_bidirectional_flow(params, model, f1, f2)  # noqa: E731

    def run(frames, queries):
        t, h, w = frames.shape[:3]
        ph = -(-h // 8) * 8
        pw = -(-w // 8) * 8
        if (ph, pw) != (h, w):
            frames = jnp.pad(frames, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)),
                             mode="edge")

        def step(carry, pair):
            pts, vis = carry
            f1, f2 = pair
            fwd, bwd = flow_fn(f1[None], f2[None])
            dflow = _sample_bilinear(fwd[0], pts)
            new_pts = pts + dflow
            # forward-backward cycle: fwd(p) + bwd(p + fwd(p)) ~ 0 for visible points
            cyc = dflow + _sample_bilinear(bwd[0], new_pts)
            consistent = jnp.linalg.norm(cyc, axis=-1) < fb_thresh
            inside = ((new_pts[:, 0] >= 0) & (new_pts[:, 0] <= w - 1)
                      & (new_pts[:, 1] >= 0) & (new_pts[:, 1] <= h - 1))
            new_vis = consistent & inside
            return (new_pts, new_vis), (new_pts, new_vis)

        init = (queries.astype(jnp.float32), jnp.ones((queries.shape[0],), bool))
        pairs = (frames[:-1], frames[1:])
        (_, _), (pts_seq, vis_seq) = jax.lax.scan(step, init, pairs)
        tracks = jnp.concatenate([queries[None].astype(jnp.float32), pts_seq], axis=0)
        vis = jnp.concatenate([jnp.ones((1, queries.shape[0]), bool), vis_seq], axis=0)
        return tracks, vis

    return jax.jit(run)


def track_video(model, params, frames: np.ndarray, grid_size: int = 16,
                fb_thresh: float = 2.0):
    """Convenience wrapper: grid queries on frame 0, full chain, numpy outputs."""
    h, w = frames.shape[1:3]
    queries = grid_queries(h, w, grid_size)
    fn = make_track_fn(model, params, fb_thresh)
    tracks, vis = fn(jnp.asarray(frames, jnp.float32), jnp.asarray(queries))
    return np.asarray(tracks), np.asarray(vis)
