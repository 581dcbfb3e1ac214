"""CogVideoX image-to-video inference CLI — analog of the reference's
``CogVideo-main/inference/cli_demo.py`` driving the LKGD-modified I2V pipeline
(reference finetune/models/cogvideox_i2v/pipeline_cogvideox_image2video.py:798-858,
including the quaternion-fusion domain/flow feature inputs).

The transformer pipeline is latent-level (pipelines/cogvideox_i2v.py); this CLI wires
the causal-3D VAE around it: encode the conditioning image, denoise, decode.

Prompts: T5 embeddings via --prompt-embeds (.npy, produced with
lkgd_tpu.models.t5_text or the precompute cache) or zeros (smoke mode).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--generate-type", choices=["i2v", "t2v", "v2v"], default="i2v",
                   help="reference cli_demo.py generate_type analog")
    p.add_argument("--image", help="conditioning image (i2v) or input video (v2v)")
    p.add_argument("--strength", type=float, default=0.8,
                   help="v2v SDEdit strength: fraction of the schedule re-denoised")
    p.add_argument("--output", default="output_cogvideox.mp4")
    p.add_argument("--weights", help="safetensors dir (transformer/vae_3d)")
    p.add_argument("--lora", help="LoRA safetensors to merge (diffusers/peft layout)")
    p.add_argument("--prompt-embeds", help=".npy T5 embeddings (B, L, 4096)")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--num-frames", type=int, default=49)
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=6.0)
    p.add_argument("--scheduler", choices=["ddim", "dpm"], default="dpm",
                   help="dpm = CogVideoXDPMScheduler (reference cli_demo.py default "
                   "for 5B, pairs with dynamic CFG); ddim = deterministic")
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--tiny", action="store_true", help="tiny config (smoke/testing)")
    p.add_argument("--variant", choices=["1.0", "1.5", "2b"], default="1.0",
                   help="1.5 = CogVideoX1.5-5B (temporal patching, 768x1360 base, "
                   "81/161 frames @16fps); 2b = CogVideoX-2b (sincos positions, "
                   "t2v/v2v only) — reference cli_demo.py model list")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh", help="SPMD mesh axes as axis=size list, e.g. 'model=4' or "
                   "'data=2,context=2,model=2'. 'model' shards the transformer weights "
                   "(tensor parallel), 'context' shards video tokens (xDiT analog), "
                   "'data' shards the CFG batch.")
    p.add_argument("--weight-sharding", choices=["tp", "fsdp"], default="tp",
                   help="how to shard weights over the mesh 'model' axis: megatron-style "
                   "tensor parallel (activation collectives) or fsdp (weights "
                   "all-gathered at use; pure memory scaling)")
    p.add_argument("--vae-tiling", action="store_true",
                   help="spatially tiled VAE decode (reference cli_demo.py "
                   "vae.enable_tiling()): bounds decode HBM by the tile, not the frame")
    p.add_argument("--vae-tile-latent", type=int, nargs=2, default=(60, 90),
                   metavar=("H", "W"), help="latent tile size for --vae-tiling")
    p.add_argument("--vae-chunk-frames", type=int, default=0,
                   help="streaming VAE decode/encode in N-latent-frame chunks with "
                   "exact conv caches (diffusers frame batching analog; encode chunks "
                   "are N x temporal-compression pixel frames); 0 = whole clip")
    p.add_argument("--sequence-parallel", choices=["none", "ulysses", "ring"],
                   default="none",
                   help="sequence-parallel attention over the mesh 'context' axis "
                   "(reference parallel_inference_xdit.py analog)")
    args = p.parse_args()

    mesh = None
    if args.mesh:
        from lkgd_tpu.parallel.mesh import make_mesh

        axes = {k: int(v) for k, v in (kv.split("=") for kv in args.mesh.split(","))}
        mesh = make_mesh(axes)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
              f"on {mesh.devices.size} {mesh.devices.flat[0].platform} devices")

    from lkgd_tpu.data.video_io import load_input, process_frames, write_video
    from lkgd_tpu.models.cogvideox import CogVideoXConfig
    from lkgd_tpu.models.vae_cogvideox import AutoencoderKLCogVideoX, CogVideoXVAEConfig
    from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                                  CogVideoXPipelineConfig)
    from lkgd_tpu.utils import porting

    import dataclasses

    from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXTextToVideoPipeline,
                                                  CogVideoXVideoToVideoPipeline)

    if args.generate_type != "t2v" and not args.image:
        p.error(f"--image is required for --generate-type {args.generate_type}")
    if args.tiny:
        tcfg = CogVideoXConfig.tiny()
    elif args.variant == "1.5":
        tcfg = CogVideoXConfig.cogvideox1_5_5b_i2v()
    elif args.variant == "2b":
        if args.generate_type == "i2v":
            p.error("CogVideoX-2b has no I2V checkpoint (t2v/v2v only)")
        tcfg = CogVideoXConfig.cogvideox_2b()
    else:
        tcfg = CogVideoXConfig.cogvideox_5b_i2v()
    if args.generate_type in ("t2v", "v2v"):
        # T2V checkpoints have no image-condition channels (reference cli_demo.py:122)
        tcfg = dataclasses.replace(tcfg, in_channels=tcfg.out_channels)
    if args.sequence_parallel != "none":
        if mesh is None or "context" not in mesh.axis_names:
            p.error("--sequence-parallel needs --mesh with a 'context' axis")
        tcfg = dataclasses.replace(tcfg, sequence_parallel=args.sequence_parallel)
    vcfg = CogVideoXVAEConfig.tiny() if args.tiny else CogVideoXVAEConfig()
    pcfg = CogVideoXPipelineConfig(
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps, guidance_scale=args.guidance_scale,
        scheduler=args.scheduler,
        vae_scale_factor_spatial=2 ** (len(vcfg.block_out_channels) - 1))
    kw = dict(config=pcfg, transformer_config=tcfg, dtype=jnp.bfloat16, mesh=mesh)
    if args.generate_type == "t2v":
        pipe = CogVideoXTextToVideoPipeline(**kw)
    elif args.generate_type == "v2v":
        pipe = CogVideoXVideoToVideoPipeline(strength=args.strength, **kw)
    else:
        pipe = CogVideoXImageToVideoPipeline(**kw)
    vae = AutoencoderKLCogVideoX(vcfg, dtype=jnp.bfloat16)

    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(args.seed))
    vae_params = vae.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 1, args.height, args.width, 3)))
    if args.weights:
        t_path = os.path.join(args.weights, "transformer.safetensors")
        if os.path.exists(t_path):
            sd = porting.load_safetensors(t_path)
            params["transformer"] = porting.port_cogvideox(
                sd, params["transformer"], strict=False)
            print(f"loaded transformer from {t_path}")
        v_path = os.path.join(args.weights, "vae_3d.safetensors")
        if os.path.exists(v_path):
            sd = porting.load_safetensors(v_path)
            vae_params = porting.port_state_dict(sd, vae_params, strict=False)
            print(f"loaded vae from {v_path}")
    if args.lora:
        sd = porting.load_safetensors(args.lora)
        params["transformer"] = porting.port_lora_safetensors(
            sd, params["transformer"], adapter_name="lora")
        print(f"merged LoRA from {args.lora}")

    if mesh is not None:
        from lkgd_tpu.parallel import tp as tplib
        from lkgd_tpu.parallel.mesh import replicated

        if "model" in mesh.axis_names:
            specs = (tplib.cogvideox_tp_specs(params) if args.weight_sharding == "tp"
                     else tplib.fsdp_specs(params, axis_size=mesh.shape["model"]))
            params = tplib.shard_params(mesh, params, specs)
        else:
            params = jax.device_put(params, replicated(mesh))
        vae_params = jax.device_put(vae_params, replicated(mesh))
        print(f"transformer bytes/device: "
              f"{tplib.per_device_param_bytes(params) / 2**20:.0f} MiB")

    if args.vae_tiling or args.vae_chunk_frames:
        # encode-side serving ladder (v2v input video / large frames)
        from lkgd_tpu.models.vae_cogvideox import chunked_encode, tiled_encode

        compress = 2 ** sum(vcfg.temporal_compress_levels)
        enc_chunk = args.vae_chunk_frames * compress if args.vae_chunk_frames else None
        sp = 2 ** (len(vcfg.block_out_channels) - 1)

        def encode(vp, img):
            if args.vae_tiling:
                lat = tiled_encode(
                    vae, vp, img, tile_height=args.vae_tile_latent[0] * sp,
                    tile_width=args.vae_tile_latent[1] * sp,
                    chunk_frames=enc_chunk if img.shape[1] > 1 else None)
            else:
                lat = chunked_encode(vae, vp, img, chunk_frames=enc_chunk)
            return lat * vcfg.scaling_factor
    else:
        @jax.jit
        def encode(vp, img):
            lat = vae.apply(vp, img, method=AutoencoderKLCogVideoX.encode_mode)
            return lat * vcfg.scaling_factor  # (B, F_lat, h, w, C_lat)

    if args.prompt_embeds:
        emb = np.load(args.prompt_embeds)
        prompt_embeds = jnp.asarray(emb if emb.ndim == 3 else emb[None])
    else:
        print("no --prompt-embeds: zero T5 embeddings (smoke mode)")
        prompt_embeds = jnp.zeros((1, tcfg.max_text_seq_length, tcfg.text_embed_dim))

    import contextlib

    rng = jax.random.PRNGKey(args.seed)
    mesh_ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    with mesh_ctx:
        latents = _generate(args, pipe, params, vae_params, encode, prompt_embeds, rng)

        if args.vae_tiling or args.vae_chunk_frames:
            from lkgd_tpu.models.vae_cogvideox import chunked_decode, tiled_decode

            zlat = jnp.asarray(latents) / vcfg.scaling_factor
            if args.vae_tiling:
                frames = tiled_decode(
                    vae, vae_params, zlat,
                    tile_latent_height=args.vae_tile_latent[0],
                    tile_latent_width=args.vae_tile_latent[1],
                    chunk_latent_frames=args.vae_chunk_frames or None)
            else:
                frames = chunked_decode(vae, vae_params, zlat,
                                        chunk_latent_frames=args.vae_chunk_frames)
            video = np.asarray(jnp.clip(frames.astype(jnp.float32) / 2.0 + 0.5,
                                        0.0, 1.0))
        else:
            @jax.jit
            def decode(vp, z):
                frames = vae.apply(vp, jnp.asarray(z) / vcfg.scaling_factor,
                                   method=AutoencoderKLCogVideoX.decode)
                return jnp.clip(frames.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

            video = np.asarray(decode(vae_params, latents))
    # 1.5 temporal patching pads the latent clip; drop the extra decoded frames
    video = video[:, :args.num_frames]
    write_video(args.output, video[0], fps=args.fps)
    print(f"wrote {args.output}: {video[0].shape}")


def _generate(args, pipe, params, vae_params, encode, prompt_embeds, rng):
    from lkgd_tpu.data.video_io import load_input, process_frames

    if args.generate_type == "t2v":
        latents = pipe(params, prompt_embeds, rng=rng)
    elif args.generate_type == "v2v":
        frames = process_frames(load_input(args.image)[:args.num_frames],
                                args.height, args.width)
        if frames.shape[0] != args.num_frames:
            # the pipeline is compiled for num_frames; fewer would silently emit a
            # shorter clip (shape-polymorphic RoPE adapts instead of erroring)
            raise SystemExit(
                f"--generate-type v2v needs {args.num_frames} input frames "
                f"(--num-frames), got {frames.shape[0]} from {args.image}")
        video_latents = encode(vae_params, jnp.asarray(frames[None]) * 2.0 - 1.0)
        latents = pipe(params, prompt_embeds, video_latents, rng=rng)
    else:
        image = process_frames(load_input(args.image)[:1], args.height, args.width)[0]
        image_latents = encode(vae_params,
                               jnp.asarray(image[None, None]) * 2.0 - 1.0)[:, 0]
        latents = pipe(params, prompt_embeds, image_latents, rng=rng)
    return latents


if __name__ == "__main__":
    main()
