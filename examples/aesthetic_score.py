"""Aesthetic-scoring walkthrough — `aesthetic_test.ipynb` analog.

The reference notebook scores images with a TF-hub VILA model; the repo's metric stack
(reference `gradios/compute_metrics.py:156+`) uses the LAION aesthetic predictor — an
MLP over CLIP image embeddings — which is what this walkthrough runs:

  1. embed images with the CLIP vision tower (`models/clip_vision.py`);
  2. score embeddings with AestheticMLP (`eval/metrics.py:96-127`);
  3. print per-image scores + the folder mean.

  python examples/aesthetic_score.py --input imgs/ \
      --clip-weights ckpt/image_encoder.safetensors --mlp-weights aesthetic.npz
  python examples/aesthetic_score.py          # synthetic smoke (tiny random models)
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="folder of images; synthetic batch if absent")
    p.add_argument("--clip-weights", help="ported CLIP ViT-H image_encoder.safetensors")
    p.add_argument("--mlp-weights", help="LAION aesthetic MLP state (npz/safetensors)")
    p.add_argument("--max-images", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lkgd_tpu.eval.metrics import AestheticMLP
    from lkgd_tpu.models.clip_vision import (CLIPVisionConfig,
                                             CLIPVisionModelWithProjection,
                                             clip_normalize)

    full = bool(args.clip_weights)
    clip = CLIPVisionModelWithProjection(
        CLIPVisionConfig() if full else CLIPVisionConfig.tiny())
    size = clip.config.image_size
    params = clip.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    if full:
        from lkgd_tpu.utils import porting

        params = porting.port_clip_vision(
            porting.load_safetensors(args.clip_weights), params, strict=False)

    if args.input:
        from PIL import Image

        files = sorted(sum((glob.glob(os.path.join(args.input, e))
                            for e in ("*.png", "*.jpg", "*.jpeg")), []))[:args.max_images]
        imgs = np.stack([
            np.asarray(Image.open(f).convert("RGB").resize((size, size),
                                                           Image.BICUBIC), np.float32)
            / 255.0 for f in files])
    else:
        print("no --input: synthetic batch")
        files = [f"synthetic_{i}" for i in range(4)]
        imgs = np.random.default_rng(0).uniform(size=(4, size, size, 3)).astype(np.float32)

    embeds = jax.jit(clip.apply)(params, clip_normalize(jnp.asarray(imgs)))
    # the LAION head consumes L2-normalized embeddings
    embeds = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)

    in_dim = embeds.shape[-1]
    if args.mlp_weights:
        from lkgd_tpu.utils.porting import load_state_dict, port_state_dict

        mlp = port_state_dict(load_state_dict(args.mlp_weights),
                              AestheticMLP.init(jax.random.PRNGKey(1), in_dim),
                              strict=False)
    else:
        mlp = AestheticMLP.init(jax.random.PRNGKey(1), in_dim)
    scores = np.asarray(AestheticMLP.apply(mlp, embeds)).reshape(-1)
    for f, s in zip(files, scores):
        print(f"{os.path.basename(str(f)):40s} {s:7.3f}")
    print(f"mean aesthetic score over {len(scores)} images: {scores.mean():.3f}")


if __name__ == "__main__":
    main()
