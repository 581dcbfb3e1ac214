"""Depth-evaluation walkthrough — `eval_depth.ipynb` analog.

The reference notebook evaluates generated depth videos against ground truth: resize to
a common grid, per-image least-squares scale/shift alignment (the Marigold convention),
then abs-rel and delta<1.25 accuracies (cell 12). The same flow with the in-tree
metrics (`lkgd_tpu/eval/metrics.py:129-164`):

  python examples/eval_depth.py --pred preds/ --gt gts/        # folders of images
  python examples/eval_depth.py                                # synthetic smoke

Folders pair files by sorted order; images are averaged to single-channel depth.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def _load_folder(folder, size):
    from PIL import Image

    out = []
    for f in sorted(glob.glob(os.path.join(folder, "*"))):
        if not f.lower().endswith((".png", ".jpg", ".jpeg", ".npy")):
            continue
        if f.endswith(".npy"):
            arr = np.load(f).astype(np.float32)
        else:
            arr = np.asarray(Image.open(f).convert("L"), np.float32) / 255.0
        if arr.shape[:2] != (size, size):
            arr = np.asarray(Image.fromarray(arr).resize((size, size),
                                                         Image.BILINEAR))
        out.append(arr.reshape(size, size))
    return np.stack(out) if out else None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", help="folder of predicted depth images/.npy")
    p.add_argument("--gt", help="folder of ground-truth depth images/.npy")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--min-depth", type=float, default=1e-3,
                   help="mask out GT below this (invalid depth convention)")
    args = p.parse_args()

    import jax.numpy as jnp

    from lkgd_tpu.eval.metrics import align_depth_least_square, depth_metrics

    if args.pred and args.gt:
        pred = _load_folder(args.pred, args.size)
        gt = _load_folder(args.gt, args.size)
        assert pred is not None and gt is not None and len(pred) == len(gt), \
            "pred/gt folders must pair by sorted order"
    else:
        print("no --pred/--gt: synthetic smoke (pred = affine(gt) + noise)")
        rng = np.random.default_rng(0)
        gt = rng.uniform(0.1, 1.0, size=(4, args.size, args.size)).astype(np.float32)
        pred = 0.5 * gt + 0.2 + rng.normal(0, 0.01, gt.shape).astype(np.float32)

    mask = (gt > args.min_depth).astype(np.float32)
    aligned, scale, shift = align_depth_least_square(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
    print(f"alignment: scale mean {np.asarray(scale).mean():.3f}, "
          f"shift mean {np.asarray(shift).mean():.3f}")
    m = depth_metrics(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
    print(json.dumps(m, indent=2))


if __name__ == "__main__":
    main()
