"""2D joint-image inference CLI — analog of the reference's
``run_models/run_inference_{depth_lora,joint_depth,mask_cond}.py`` demos, which drive
the SD-inpaint / joint-control pipelines (reference pipeline_stable_diffusion_inpaint.py,
pipeline_stable_diffusion_joint_control.py:973-1016).

Examples:
  # inpaint an image region
  python -m lkgd_tpu.cli.run_inference_sd2d --mode inpaint --image img.png --mask mask.png

  # joint condition->image generation (x stream conditioned, y generated)
  python -m lkgd_tpu.cli.run_inference_sd2d --mode joint_control --image depth.png

Prompts: pass --prompt (needs transformers' CLIP tokenizer files via --tokenizer) or
--prompt-embeds saved as .npy (B, L, D); otherwise zero embeddings (smoke mode).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def encode_prompt(args, ctx_dim: int):
    if args.prompt_embeds:
        emb = np.load(args.prompt_embeds)
        return jnp.asarray(emb if emb.ndim == 3 else emb[None])
    if args.prompt and args.tokenizer:
        from transformers import CLIPTokenizer

        from lkgd_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from lkgd_tpu.utils import porting

        tok = CLIPTokenizer.from_pretrained(args.tokenizer)
        ids = tok(args.prompt, padding="max_length", max_length=77,
                  truncation=True, return_tensors="np").input_ids
        text = CLIPTextModel(CLIPTextConfig.open_clip_h())
        params = text.init(jax.random.PRNGKey(0), jnp.asarray(ids))
        path = os.path.join(args.weights or "", "text_encoder.safetensors")
        if args.weights and os.path.exists(path):
            params = porting.port_state_dict(porting.load_safetensors(path), params,
                                             strict=False)
        return text.apply(params, jnp.asarray(ids))
    print("no prompt source: zero prompt embeddings (smoke mode)")
    return jnp.zeros((1, 77, ctx_dim))


def main():
    from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["inpaint", "joint_control"], default="inpaint")
    p.add_argument("--image", required=True)
    p.add_argument("--mask", help="inpaint mode: white = regenerate")
    p.add_argument("--output", default="output_sd2d.png")
    p.add_argument("--weights", help="safetensors dir (unet/vae/text_encoder)")
    p.add_argument("--prompt")
    p.add_argument("--prompt-embeds", help=".npy prompt embeddings (B, L, D)")
    p.add_argument("--tokenizer", help="dir with CLIP tokenizer files for --prompt")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=7.5)
    p.add_argument("--cond-y", action="store_true",
                   help="joint_control: condition the y stream instead of x")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from lkgd_tpu.data.video_io import load_input, process_frames
    from lkgd_tpu.pipelines.sd2d import (SD2DPipelineConfig,
                                         StableDiffusionInpaintPipeline,
                                         StableDiffusionJointControlPipeline)
    from lkgd_tpu.utils import porting

    cfg = SD2DPipelineConfig(height=args.height, width=args.width,
                             num_inference_steps=args.num_inference_steps,
                             guidance_scale=args.guidance_scale)
    if args.mode == "inpaint":
        pipe = StableDiffusionInpaintPipeline(cfg, dtype=jnp.bfloat16)
    else:
        pipe = StableDiffusionJointControlPipeline(cfg, cond_x=not args.cond_y,
                                                   dtype=jnp.bfloat16)

    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(args.seed))
    if args.weights:
        for name, fname in (("unet", "unet.safetensors"), ("vae", "vae.safetensors")):
            path = os.path.join(args.weights, fname)
            if os.path.exists(path):
                sd = porting.load_safetensors(path)
                params[name] = porting.port_state_dict(sd, params[name], strict=False)
                print(f"loaded {name} from {path}")

    image = process_frames(load_input(args.image)[:1], args.height, args.width)[0]
    emb = encode_prompt(args, pipe.unet.config.cross_attention_dim)
    rng = jax.random.PRNGKey(args.seed)

    if args.mode == "inpaint":
        if args.mask:
            mask = process_frames(load_input(args.mask)[:1], args.height, args.width)[0]
            mask = (mask.mean(-1, keepdims=True) > 0.5).astype(np.float32)
        else:
            mask = np.ones((args.height, args.width, 1), np.float32)
        out = pipe(params, emb, image[None] * 2.0 - 1.0, mask[None], rng=rng)
    else:
        out = pipe(params, emb, image[None] * 2.0 - 1.0, rng=rng)

    import cv2

    img = np.clip(np.asarray(out[0], np.float32), 0, 1)
    cv2.imwrite(args.output, (img[..., ::-1] * 255).astype(np.uint8))
    print(f"wrote {args.output}: {img.shape}")


if __name__ == "__main__":
    main()
