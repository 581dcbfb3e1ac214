"""Image-to-video inference CLI — `run_models/run_inference_svd.py` /
`run_inference_trans_svd.py` analog.

Examples:
  # base img2vid from one frame
  python -m lkgd_tpu.cli.run_inference_svd --image frame.png --output out.gif \
      --height 576 --width 1024 --num-frames 14

  # frame transition between two frames (joint attention)
  python -m lkgd_tpu.cli.run_inference_svd --mode trans --image start.png --end-image end.png \
      --checkpoint ckpt_dir --joint-mask 0,1,0,1 --flip

Weights: --weights points to a diffusers-layout safetensors dump (unet/vae/image_encoder
subfolders or combined files) imported via lkgd_tpu.utils.porting; without --weights the
model runs with random init (smoke/benchmark mode).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_mesh(args):
    """Multi-chip SPMD (the xDiT Ulysses/ring + CFG-parallel analog,
    reference parallel_inference_xdit.py:14-51): CFG/batch rows shard over 'data',
    latent frames over 'context'; XLA inserts the ICI collectives."""
    if args.data_parallel * args.context_parallel * args.model_parallel <= 1:
        return None
    from lkgd_tpu.parallel import mesh as meshlib

    axes = {"data": args.data_parallel, "context": args.context_parallel,
            "model": args.model_parallel}
    return meshlib.make_mesh({k: v for k, v in axes.items() if v > 1} or None)


def build_pipeline(args):
    from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, LoraRule, SVDUNetConfig
    from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline, SVDPipelineConfig
    from lkgd_tpu.pipelines.svd_trans import StableVideoDiffusionTransPipeline

    joint = None
    lora = LoraRouter()
    if args.mode in ("trans", "smooth"):
        mask = tuple(int(x) for x in args.joint_mask.split(","))
        joint = JointAttentionConfig(post=args.post_joint, flip=args.flip, mask=mask,
                                     spatial=not args.nospatial, temporal=args.temporal)
        rules = []
        if args.lora_rank:
            inv = tuple(1 - m for m in mask)
            rules = [
                LoraRule("*attn1n*", "yx_lora", args.lora_rank, args.lora_rank, mask),
                LoraRule("*temporal_transformer_blocks*attn1.*", "xy_lora",
                         args.lora_rank, args.lora_rank, inv),
            ]
        lora = LoraRouter(rules=tuple(rules))

    unet_config = SVDUNetConfig(num_frames=args.num_frames, joint=joint, lora=lora,
                                knowledge_fusion=args.knowledge_fusion)
    mesh = build_mesh(args)
    pcfg = SVDPipelineConfig(
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        min_guidance_scale=args.min_guidance_scale,
        max_guidance_scale=args.max_guidance_scale, fps=args.fps,
        motion_bucket_id=args.motion_bucket_id, noise_aug_strength=args.noise_aug_strength,
        decode_chunk_size=args.decode_chunk_size)
    if args.mode == "trans":
        return StableVideoDiffusionTransPipeline(config=pcfg, unet_config=unet_config,
                                                 dtype=jnp.bfloat16, mesh=mesh)
    if args.mode == "flow":
        from lkgd_tpu.pipelines.svd_flow import StableVideoDiffusionFlowPipeline

        return StableVideoDiffusionFlowPipeline(config=pcfg, unet_config=unet_config,
                                                dtype=jnp.bfloat16, mesh=mesh)
    if args.mode == "smooth":
        from lkgd_tpu.pipelines.svd_smooth import StableVideoDiffusionSmoothPipeline

        return StableVideoDiffusionSmoothPipeline(
            config=pcfg, unet_config=unet_config, dtype=jnp.bfloat16, mesh=mesh,
            start_step=args.smooth_start_step, total_frames=args.smooth_total_frames)
    if args.mode == "controlnet":
        from lkgd_tpu.pipelines.svd_controlnet import StableVideoDiffusionControlNetPipeline

        return StableVideoDiffusionControlNetPipeline(
            config=pcfg, unet_config=unet_config, dtype=jnp.bfloat16, mesh=mesh,
            reverse_time=args.reverse_time,
            controlnet_cond_scale=args.controlnet_cond_scale)
    return StableVideoDiffusionPipeline(config=pcfg, unet_config=unet_config,
                                        dtype=jnp.bfloat16, mesh=mesh)


def load_params(pipe, args):
    if not args.weights:
        print("no --weights given: random-init params (smoke mode)")
        return jax.jit(pipe.init_params)(jax.random.PRNGKey(args.seed))
    from lkgd_tpu.utils import porting

    template = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    params = dict(template)
    mapping = {"unet": (porting.port_svd_unet, "unet.safetensors"),
               "vae": (porting.port_temporal_vae, "vae.safetensors"),
               "image_encoder": (porting.port_clip_vision, "image_encoder.safetensors")}
    for key, (port, fname) in mapping.items():
        path = os.path.join(args.weights, fname)
        if os.path.exists(path):
            sd = porting.load_safetensors(path)
            params[key] = port(sd, template[key], strict=False)
            print(f"loaded {key} from {path} ({len(sd)} tensors)")
    return params


def main():
    from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["base", "trans", "flow", "smooth", "controlnet"],
                   default="base")
    p.add_argument("--image", required=True)
    p.add_argument("--end-image")
    p.add_argument("--control-video",
                   help="controlnet mode: video whose frames are the per-frame control "
                        "images (preprocess with lkgd_tpu.cli.annotate for depth/edges)")
    p.add_argument("--controlnet-cond-scale", type=float, default=1.0)
    p.add_argument("--reverse-time", action="store_true",
                   help="condition on the LAST frame (time-reversal pipeline)")
    p.add_argument("--output", default="output.gif")
    p.add_argument("--weights")
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--num-inference-steps", type=int, default=25)
    p.add_argument("--min-guidance-scale", type=float, default=1.0)
    p.add_argument("--max-guidance-scale", type=float, default=3.0)
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--motion-bucket-id", type=int, default=127)
    p.add_argument("--noise-aug-strength", type=float, default=0.02)
    p.add_argument("--decode-chunk-size", type=int, default=2)
    p.add_argument("--seed", type=int, default=23123134)  # reference default seed
    # trans/joint options (explicit replacements for the reference's dir-name flags)
    p.add_argument("--joint-mask", default="0,1,0,1")
    p.add_argument("--post-joint", choices=["conv", "scale", "conv_fuse"], default="conv")
    p.add_argument("--flip", action="store_true")
    p.add_argument("--temporal", action="store_true")
    p.add_argument("--nospatial", action="store_true")
    p.add_argument("--lora-rank", type=int, default=0)
    p.add_argument("--knowledge-fusion", action="store_true")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="mesh 'data' axis size (CFG/batch shard; xDiT cfg-parallel analog)")
    p.add_argument("--context-parallel", type=int, default=1,
                   help="mesh 'context' axis size (frame shard; Ulysses/ring analog)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="mesh 'model' axis size: FSDP-style weight sharding "
                   "(parallel/tp.py fsdp_specs) — each chip holds ~1/N of the params")
    p.add_argument("--smooth-start-step", type=int, default=10)
    p.add_argument("--smooth-total-frames", type=int, default=50)
    args = p.parse_args()

    from lkgd_tpu.data.video_io import load_input, process_frames, write_video

    pipe = build_pipeline(args)
    params = load_params(pipe, args)
    if pipe.mesh is not None and "model" in pipe.mesh.axis_names:
        from lkgd_tpu.parallel import tp as tplib

        params = tplib.shard_params(
            pipe.mesh, params,
            tplib.fsdp_specs(params, axis_size=pipe.mesh.shape["model"]))
        print(f"FSDP weight sharding over model={pipe.mesh.shape['model']}: "
              f"{tplib.per_device_param_bytes(params) / 2**20:.0f} MiB/device")

    frames = load_input(args.image)
    image = process_frames(frames[:1], args.height, args.width)[0]
    rng = jax.random.PRNGKey(args.seed)

    if args.mode == "smooth":
        video = load_input(args.image)[: args.smooth_total_frames]
        video = process_frames(video, args.height, args.width)
        out = pipe(params, video, rng=rng)[0]
        write_video(args.output, out, fps=args.fps)
        print(f"wrote {args.output}: {out.shape}")
        return
    if args.mode == "flow":
        flow_video = pipe(params, image[None], flow_cond=image[None], rng=rng)
        write_video(args.output, flow_video[0], fps=args.fps)
        print(f"wrote {args.output}: {flow_video[0].shape}")
        return
    if args.mode == "controlnet":
        if args.control_video:
            ctrl = process_frames(load_input(args.control_video)[: args.num_frames],
                                  args.height, args.width)
        else:
            ctrl = np.zeros((args.num_frames, args.height, args.width, 3), np.float32)
        video = pipe(params, image[None], control=jnp.asarray(ctrl)[None], rng=rng)
        write_video(args.output, video[0], fps=args.fps)
        print(f"wrote {args.output}: {video[0].shape}")
        return
    if args.mode == "trans":
        end_path = args.end_image or args.image
        eframes = load_input(end_path)
        end_image = process_frames(eframes[-1:], args.height, args.width)[0]
        video = pipe(params, image, end_image, rng=rng)
        out = np.concatenate([video[0], video[1]], axis=2)  # side by side
    else:
        video = pipe(params, image[None], rng=rng)
        out = video[0]

    write_video(args.output, out, fps=args.fps)
    print(f"wrote {args.output}: {out.shape}")


if __name__ == "__main__":
    main()
