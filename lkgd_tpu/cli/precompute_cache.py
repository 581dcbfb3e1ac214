"""Precompute VAE latents / CLIP embeddings / knowledge features into the native tensor
cache — the `CogVideo-main/finetune/datasets/i2v_dataset.py:102-124` precompute path,
restructured onto native/tensor_cache.cc (one mmap'd file instead of thousands of .pt).

  python -m lkgd_tpu.cli.precompute_cache --video-folder clips/ --output cache.lkgd \
      --height 512 --width 512 --num-frames 14 [--weights ckpts/]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main():
    from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--video-folder", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--weights")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--knowledge", action="store_true",
                   help="also compute domain/flow ViT features")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lkgd_tpu.data.tensor_cache import TensorCache
    from lkgd_tpu.data.video_io import process_frames, read_video_frames
    from lkgd_tpu.models.clip_vision import CLIPVisionModelWithProjection, clip_normalize
    from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder, TemporalVAEConfig
    from lkgd_tpu.ops.resize import resize_with_antialiasing

    vae = AutoencoderKLTemporalDecoder(TemporalVAEConfig(), dtype=jnp.float32)
    clip = CLIPVisionModelWithProjection(dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    vae_params = vae.init(rng, jnp.zeros((1, args.height, args.width, 3)), num_frames=1)
    clip_params = clip.init(rng, jnp.zeros((1, 224, 224, 3)))
    if args.weights:
        from lkgd_tpu.utils import porting

        for name, port, tpl in (("vae", porting.port_temporal_vae, vae_params),
                                ("image_encoder", porting.port_clip_vision, clip_params)):
            path = os.path.join(args.weights, f"{name}.safetensors")
            if os.path.exists(path):
                loaded = port(porting.load_safetensors(path), tpl, strict=False)
                if name == "vae":
                    vae_params = loaded
                else:
                    clip_params = loaded

    @jax.jit
    def encode(vp, cp, frames):  # params as ARGS (closing over them captures GBs of constants)
        lat = vae.apply(vp, frames, method=AutoencoderKLTemporalDecoder.encode_mode)
        cond = lat[0] * 1.0  # first-frame cond latents (unscaled)
        x = resize_with_antialiasing(frames[:1], (224, 224))
        emb = clip.apply(cp, clip_normalize((x + 1.0) / 2.0))
        return lat * 0.18215, cond, emb

    cache = TensorCache(args.output)
    files = sorted(glob.glob(os.path.join(args.video_folder, "*.mp4")))
    for f in files:
        name = os.path.splitext(os.path.basename(f))[0]
        if f"{name}/latents" in cache:
            continue
        frames, fps = read_video_frames(f, max_frames=args.num_frames)
        if len(frames) < args.num_frames:
            print(f"skip {name}: only {len(frames)} frames")
            continue
        proc = process_frames(frames[: args.num_frames], args.height, args.width)
        lat, cond, emb = encode(vae_params, clip_params, jnp.asarray(proc * 2.0 - 1.0))
        cache.put(f"{name}/latents", np.asarray(lat))
        cache.put(f"{name}/cond_latents", np.asarray(cond))
        cache.put(f"{name}/image_embeddings", np.asarray(emb)[:, None])  # (1, 1, D)
        print(f"cached {name}: latents {lat.shape}")
    print(f"done: {len(cache)} tensors in {args.output}")


if __name__ == "__main__":
    main()
