"""Quality metrics — the evaluation harness the reference runs offline.

Re-implements `/root/reference/gradios/compute_metrics.py` (FID :124-131, CLIP score
:139-152, CLIP-aesthetic MLP :156+) and the depth metrics of `eval_depth.ipynb` (abs-rel /
delta accuracies with Marigold least-squares alignment :98-119), plus PSNR/SSIM for the
driver's parity checks. Frechet distances take *features* from a pluggable extractor:
eval.fid_inception (pytorch-fid InceptionV3 -> standard FID) and eval.i3d (Kinetics-400
I3D -> standard FVD) are the real, published-comparable extractors (weights ported via
their port_torch_state_dict); CLIP features — models.clip_vision — give the cheaper
CLIP-FID/CLIP-FVD and are always labeled as such.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ pixel metrics
def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Global-window SSIM per image, averaged ((B,H,W,C) in [0,1])."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    axes = tuple(range(1, a.ndim))
    mu_a = jnp.mean(a, axes, keepdims=True)
    mu_b = jnp.mean(b, axes, keepdims=True)
    var_a = jnp.var(a, axes, keepdims=True)
    var_b = jnp.var(b, axes, keepdims=True)
    cov = jnp.mean((a - mu_a) * (b - mu_b), axes, keepdims=True)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2))
    return jnp.mean(s)


# ------------------------------------------------------------------ Frechet distances
def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6) -> float:
    """FID/FVD core: Frechet distance between gaussians fit to feature sets (N, D)."""
    import scipy.linalg

    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False)
    s2 = np.cov(feats_b, rowvar=False)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(s1 @ s2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((s1 + offset) @ (s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    return frechet_distance(np.asarray(real), np.asarray(fake))


def fvd_from_features(real_video_feats: np.ndarray, fake_video_feats: np.ndarray) -> float:
    """Frechet Video Distance over per-video features (N_videos, D)."""
    return frechet_distance(np.asarray(real_video_feats), np.asarray(fake_video_feats))


def make_clip_feature_extractor(clip_model, clip_params):
    """Images [0,1] (B,H,W,3) -> L2-normalized CLIP embeddings (for CLIP-FID/score)."""
    from lkgd_tpu.models.clip_vision import clip_normalize
    from lkgd_tpu.ops.resize import resize_with_antialiasing

    size = clip_model.config.image_size

    @jax.jit
    def _extract(params, images):  # params as args: closing over them captures GBs
        x = resize_with_antialiasing(images.astype(jnp.float32), (size, size))
        emb = clip_model.apply(params, clip_normalize(x))
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    return lambda images: _extract(clip_params, images)


# ------------------------------------------------------------------ CLIP score + aesthetics
def clip_score(image_embeds: jnp.ndarray, text_embeds: jnp.ndarray) -> jnp.ndarray:
    """100 * max(cos, 0), averaged (torchmetrics CLIPScore convention used at
    reference compute_metrics.py:139-152)."""
    a = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    b = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    return jnp.mean(100.0 * jnp.maximum(jnp.sum(a * b, -1), 0.0))


class AestheticMLP:
    """LAION aesthetic predictor head (reference compute_metrics.py:156+): an MLP on CLIP
    image embeddings with layer sizes 768->1024->128->64->16->1. Weights port via
    utils.porting from the public checkpoint."""

    sizes = (1024, 128, 64, 16, 1)

    @staticmethod
    def init(rng: jax.Array, in_dim: int = 768) -> dict:
        params = {}
        d = in_dim
        for i, out in enumerate(AestheticMLP.sizes):
            k1, rng = jax.random.split(rng)
            params[f"layers_{i}"] = {
                "kernel": jax.random.normal(k1, (d, out)) * (1.0 / np.sqrt(d)),
                "bias": jnp.zeros((out,)),
            }
            d = out
        return params

    @staticmethod
    def apply(params: dict, clip_embeds: jnp.ndarray) -> jnp.ndarray:
        x = clip_embeds
        n = len(AestheticMLP.sizes)
        for i in range(n):
            p = params[f"layers_{i}"]
            x = x @ p["kernel"] + p["bias"]
            if i < n - 1:
                x = jax.nn.relu(x)  # reference MLP uses dropout(train)/identity(eval)
        return x[..., 0]


# ------------------------------------------------------------------ depth metrics
def align_depth_least_square(pred: jnp.ndarray, gt: jnp.ndarray,
                             mask: Optional[jnp.ndarray] = None
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-image scale/shift least squares (Marigold convention, reference
    compute_metrics.py:98-119). Returns (aligned_pred, scale, shift)."""
    p = pred.astype(jnp.float32).reshape(pred.shape[0], -1)
    g = gt.astype(jnp.float32).reshape(gt.shape[0], -1)
    m = (jnp.ones_like(p) if mask is None else
         mask.astype(jnp.float32).reshape(mask.shape[0], -1))
    n = jnp.sum(m, -1, keepdims=True)
    sp = jnp.sum(m * p, -1, keepdims=True)
    sg = jnp.sum(m * g, -1, keepdims=True)
    spp = jnp.sum(m * p * p, -1, keepdims=True)
    spg = jnp.sum(m * p * g, -1, keepdims=True)
    det = n * spp - sp**2
    scale = (n * spg - sp * sg) / jnp.maximum(det, 1e-8)
    shift = (sg * spp - sp * spg) / jnp.maximum(det, 1e-8)
    aligned = scale * p + shift
    return aligned.reshape(pred.shape), scale[..., 0], shift[..., 0]


def depth_metrics(pred: jnp.ndarray, gt: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None, align: bool = True) -> dict:
    """abs-rel + delta accuracies (eval_depth.ipynb cell 12)."""
    if align:
        pred, _, _ = align_depth_least_square(pred, gt, mask)
    pred = jnp.maximum(pred.astype(jnp.float32), 1e-6)
    gt = jnp.maximum(gt.astype(jnp.float32), 1e-6)
    m = jnp.ones_like(gt) if mask is None else mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    abs_rel = jnp.sum(m * jnp.abs(pred - gt) / gt) / n
    ratio = jnp.maximum(pred / gt, gt / pred)
    out = {"abs_rel": abs_rel}
    for i, thr in enumerate((1.25, 1.25**2, 1.25**3), start=1):
        out[f"delta{i}"] = jnp.sum(m * (ratio < thr)) / n
    return {k: float(v) for k, v in out.items()}
