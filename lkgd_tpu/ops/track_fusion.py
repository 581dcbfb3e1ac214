"""Track-guided frame-pair feature fusion — the patch_FSM joint-frame mechanism.

Re-implements `/root/reference/patch/patch_FSM.py:386-443` (the ``enable_joint_attention``
branch of the patched 2D transformer block, used by ``train_joint_frame_sd.py`` /
``run_inference_joint_frame_sd.py``): point tracks align features between the paired
frames of a (src, dst) batch — dst features are gathered at dst track points and
visibility-averaged onto src coordinates, fused with the src features through a
zero-init 3x3 conv, and the dst-side fusion output is routed back through the same
tracks onto dst coordinates. Both streams receive their fusion as a residual add.

TPU-native form: the reference's ``torch.gather``/``scatter_add`` loops become
``take_along_axis`` + ``.at[].add`` under ``vmap`` (XLA lowers these to sorted-segment
scatters); indices are precomputed int32 token ids (tracks quantized to the feature
grid by :func:`quantize_tracks`), so everything is static-shaped and jit-safe.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def quantize_tracks(src_tracks: jnp.ndarray, dst_tracks: jnp.ndarray,
                    feat_h: int, feat_w: int, downsample: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-space tracks (B, Nt, 2) xy -> flat token indices (B, Nt) on the feature
    grid (reference :397-405: floor-divide by downsample, clamp, x + y*W)."""

    def flat(tr):
        t = (tr / downsample).astype(jnp.int32)
        x = jnp.clip(t[..., 0], 0, feat_w - 1)
        y = jnp.clip(t[..., 1], 0, feat_h - 1)
        return x + y * feat_w

    return flat(src_tracks), flat(dst_tracks)


def _scatter_mean(vals: jnp.ndarray, idx: jnp.ndarray, vis: jnp.ndarray,
                  n_tokens: int) -> jnp.ndarray:
    """Visibility-masked scatter-add of (Nt, C) onto (n_tokens, C), divided by the
    per-token visibility count (reference scatter_add / (vis + 1e-6))."""
    vals = vals * vis[:, None]
    canvas = jnp.zeros((n_tokens, vals.shape[-1]), vals.dtype).at[idx].add(vals)
    count = jnp.zeros((n_tokens, 1), vals.dtype).at[idx].add(vis[:, None])
    return canvas / (count + 1e-6)


def track_scatter_fusion(hidden: jnp.ndarray, src_idx: jnp.ndarray,
                         dst_idx: jnp.ndarray, visibility: jnp.ndarray,
                         conv_fuse: Callable[[jnp.ndarray], jnp.ndarray],
                         feat_h: int, feat_w: int) -> jnp.ndarray:
    """``hidden`` (2B, N, C) with src frames at ::2 and dst frames at 1::2 (the
    reference's paired joint-frame batch); ``src_idx``/``dst_idx`` (B, Nt) flat token
    ids; ``visibility`` (B, Nt) in {0, 1}; ``conv_fuse`` maps (B, H, W, 2C) -> 2C.
    Returns hidden with both streams' fusion residuals added."""
    src = hidden[::2]
    dst = hidden[1::2]
    b, n, c = src.shape
    vis = visibility.astype(src.dtype)

    gathered_dst = jnp.take_along_axis(dst, dst_idx[..., None], axis=1)  # (B, Nt, C)
    aligned = jax.vmap(_scatter_mean, in_axes=(0, 0, 0, None))(
        gathered_dst, src_idx, vis, n)

    cat = jnp.concatenate([src, aligned], axis=-1).reshape(b, feat_h, feat_w, 2 * c)
    fused = conv_fuse(cat).reshape(b, n, 2 * c)
    src_fused, dst_scattered = jnp.split(fused, 2, axis=-1)

    regathered = jnp.take_along_axis(dst_scattered, src_idx[..., None], axis=1)
    dst_fused = jax.vmap(_scatter_mean, in_axes=(0, 0, 0, None))(
        regathered, dst_idx, vis, n)

    out = jnp.stack([src + src_fused, dst + dst_fused], axis=1)  # (B, 2, N, C)
    return out.reshape(hidden.shape)
