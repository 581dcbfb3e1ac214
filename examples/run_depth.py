"""Depth-conditioned 2D generation walkthrough — `run_depth.ipynb` analog.

The reference notebook loads a depth map (or extracts one with the transformers
depth-estimation pipeline), builds the patched SD pipeline with the condition-channel
UNet (`models/unet_2d_condition_cond.py`), and samples images conditioned on it. The
same flow here:

  1. obtain a depth map — from a file, or from an RGB image through the in-tree
     DPT-large port (`models/midas.py`, needs --depth-weights), or synthetic;
  2. run StableDiffusionConditionPipeline (pipelines/sd2d.py): the depth map enters
     through the UNet's ConditioningEmbedding conv encoder at conv_in resolution;
  3. write the samples.

With no weight flags this runs a TINY randomly-initialized model end-to-end (the code
path is identical; only the numbers are untrained). With --weights pointing at ported
SD2 checkpoints it is a real depth-to-image run.

  python examples/run_depth.py --out /tmp/depth_samples     # synthetic smoke
  python examples/run_depth.py --depth depth.png --weights ckpt/ --out samples/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", help="depth map image (grayscale); synthetic if absent")
    p.add_argument("--image", help="RGB image to extract depth FROM (needs --depth-weights)")
    p.add_argument("--depth-weights", help="Intel/dpt-large state dict for depth extraction")
    p.add_argument("--weights", help="ported SD2 checkpoint dir (unet/vae safetensors)")
    p.add_argument("--prompt-embeds", help=".npy OpenCLIP text embeddings (B, L, 1024)")
    p.add_argument("--out", default="depth_samples")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--size", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lkgd_tpu.models.unet_2d import UNet2DConfig
    from lkgd_tpu.models.vae_2d import VAE2DConfig
    from lkgd_tpu.pipelines.sd2d import SD2DPipelineConfig, StableDiffusionConditionPipeline

    # ---- 1. the depth map
    if args.image and args.depth_weights:
        from lkgd_tpu.data.video_io import read_image
        from lkgd_tpu.models.midas import make_depth_processor

        depth = make_depth_processor(args.depth_weights)(read_image(args.image)[None])[0]
        depth = depth[..., :1] if depth.ndim == 3 else depth[..., None]
    elif args.depth:
        from lkgd_tpu.data.video_io import read_image

        depth = read_image(args.depth).mean(-1, keepdims=True)
    else:
        yy, xx = np.mgrid[0:args.size, 0:args.size]
        depth = ((xx + yy) / (2 * args.size)).astype(np.float32)[..., None]
        print("no --depth/--image: synthetic gradient depth map")
    depth3 = np.repeat(depth, 3, axis=-1)[None]  # pipeline cond is 3-channel

    # ---- 2. the condition pipeline (tiny random model unless --weights)
    full = bool(args.weights)
    ucfg = (UNet2DConfig(cond_embedding_channels=3) if full else
            UNet2DConfig(block_out_channels=(32, 64),
                         down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                         up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                         layers_per_block=1, num_attention_heads=(2, 4),
                         cross_attention_dim=64, cond_embedding_channels=3))
    # the UNet's ConditioningEmbedding downsamples by 8 to conv_in resolution, so the
    # tiny VAE must also be a factor-8 (4-level) ladder
    vcfg = (VAE2DConfig() if full else
            VAE2DConfig(block_out_channels=(32, 32, 64, 64), layers_per_block=1))
    h = depth3.shape[1] - depth3.shape[1] % 8
    pipe = StableDiffusionConditionPipeline(
        SD2DPipelineConfig(height=h, width=h, num_inference_steps=args.steps,
                           guidance_scale=7.5),
        unet_config=ucfg, vae_config=vcfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    if full:
        from lkgd_tpu.utils import porting

        sd = porting.load_safetensors(os.path.join(args.weights, "unet.safetensors"))
        params["unet"] = porting.port_unet_2d(sd, params["unet"], strict=False)

    if args.prompt_embeds:
        pe = jnp.asarray(np.load(args.prompt_embeds))
    else:
        pe = jnp.zeros((1, 8, ucfg.cross_attention_dim))

    # ---- 3. sample + save
    imgs = pipe(params, pe, jnp.asarray(depth3[:, :h, :h]), rng=jax.random.PRNGKey(1))
    os.makedirs(args.out, exist_ok=True)
    from lkgd_tpu.data.video_io import write_video

    write_video(os.path.join(args.out, "sample.gif"), imgs, fps=1)
    print(f"wrote {args.out}/sample.gif: {imgs.shape}, "
          f"finite={np.isfinite(imgs).all()}")


if __name__ == "__main__":
    main()
