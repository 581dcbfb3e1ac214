"""LKGD fine-tuning CLI — `train_models/train_svd_lora.py` analog (SURVEY.md §2.5).

Trains the quaternion latent-knowledge fusion modules + temporal-attention LoRA on a
folder of mp4 clips (MiniDataset), with frozen VAE/CLIP, EDM loss, conditioning dropout,
checkpointing, and optional joint/trans adapters.

  python -m lkgd_tpu.cli.train_svd_lora --video-folder data/clips --output-dir out \
      --width 512 --height 512 --num-frames 14 --rank 4 --learning-rate 2e-4
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main():
    from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--video-folder", required=True)
    p.add_argument("--output-dir", default="output_svd_lora")
    p.add_argument("--weights", help="diffusers-layout safetensors dir (see run CLI)")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--per-device-batch-size", type=int, default=1)
    p.add_argument("--rank", type=int, default=4)
    p.add_argument("--learning-rate", type=float, default=2e-4)
    p.add_argument("--max-steps", type=int, default=1000)
    p.add_argument("--checkpoint-every", type=int, default=200)
    p.add_argument("--conditioning-dropout-prob", type=float, default=0.1)
    p.add_argument("--mode", choices=["lkgd", "trans"], default="lkgd",
                   help="lkgd: quaternion fusion + temporal LoRA (train_svd_lora); "
                        "trans: joint xy/yx/y adapters (train_svd_trans_lora)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--use-8bit-adam", action="store_true",
                   help="int8 Adam moments (training/optim8bit.py) — the reference's "
                        "bitsandbytes --use_8bit_adam memory lever "
                        "(train_svd_lora.py:1197-1207)")
    p.add_argument("--report-to", choices=["jsonl", "tensorboard", "wandb"],
                   default="jsonl",
                   help="metrics tracker mirror (reference --report_to + init_trackers, "
                        "train_svd_lora.py:1316); JSONL logging is always on")
    p.add_argument("--validation-image", action="append", default=[],
                   help="conditioning image rendered through the FULL pipeline with the "
                        "current params every --validation-every steps, written as GIFs "
                        "(reference in-training validation, train_svd_lora.py:1750-1832). "
                        "trans mode consumes these in [start, end] pairs")
    p.add_argument("--validation-every", type=int, default=0)
    p.add_argument("--num-validation-steps", type=int, default=25,
                   help="denoising steps for validation clips")
    args = p.parse_args()

    from lkgd_tpu.data.datasets import MiniDataset, PrefetchLoader
    from lkgd_tpu.models.clip_vision import CLIPVisionModelWithProjection, clip_normalize
    from lkgd_tpu.models.configs import (JointAttentionConfig, LoraRouter, LoraRule,
                                         SVDUNetConfig)
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
    from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder, TemporalVAEConfig
    from lkgd_tpu.models.vit_mae import ViT, ViTConfig, encode_knowledge_features
    from lkgd_tpu.ops.resize import resize_with_antialiasing
    from lkgd_tpu.parallel import mesh as meshlib
    from lkgd_tpu.training.train_state import (SVDTrainConfig, init_train_state,
                                               make_optimizer, make_svd_train_step)
    from lkgd_tpu.training.trainer import Trainer, TrainerConfig, export_trainable_safetensors

    # ---- model configs (reference train_svd_lora.py:1068-1102 adapter layout)
    if args.mode == "lkgd":
        unet_config = SVDUNetConfig(
            num_frames=args.num_frames, knowledge_fusion=True,
            lora=LoraRouter(rules=(
                LoraRule("*temporal_transformer_blocks*attn1.*", "lkgd", args.rank,
                         float(args.rank)),)))
        trainable = lambda path: "lora_" in path or "knowledge_fusion" in path
    else:  # trans: joint adapters xy/yx/y with stream masks (train_svd_trans_lora:1054-1089)
        unet_config = SVDUNetConfig(
            num_frames=args.num_frames,
            joint=JointAttentionConfig(post="conv", flip=True, mask=(0, 1)),
            lora=LoraRouter(rules=(
                LoraRule("*attn1n*", "yx_lora", args.rank, float(args.rank), (0, 1)),
                LoraRule("*attn1.*", "xy_lora", args.rank, float(args.rank), (1, 0)),
                LoraRule("*attn2*", "y_lora", args.rank, float(args.rank), (0, 1)),
            )))
        trainable = lambda path: "lora_" in path or "joint" in path

    unet = UNetSpatioTemporalCondition(unet_config, dtype=jnp.float32)
    vae = AutoencoderKLTemporalDecoder(TemporalVAEConfig(), dtype=jnp.float32)
    clip = CLIPVisionModelWithProjection(dtype=jnp.float32)
    domain_vit = ViT(ViTConfig.vit_base_patch16_384(), dtype=jnp.float32)

    rng = jax.random.PRNGKey(args.seed)
    h_lat, w_lat = args.height // 8, args.width // 8
    B = args.per_device_batch_size * jax.device_count()
    # trans mode trains on interleaved [x, y] stream pairs -> init with the doubled rows
    Bi = B * 2 if args.mode == "trans" else B
    dom0 = jnp.zeros((Bi, 1, 1000))
    unet_params = unet.init(rng, jnp.zeros((Bi, args.num_frames, h_lat, w_lat, 8)),
                            jnp.zeros((Bi,)), jnp.zeros((Bi, 1, 1024)), jnp.zeros((Bi, 3)),
                            domain_features=dom0, flow_features=dom0)
    vae_params = vae.init(rng, jnp.zeros((1, args.height, args.width, 3)), num_frames=1)
    clip_params = clip.init(rng, jnp.zeros((1, 224, 224, 3)))
    vit_params = domain_vit.init(rng, jnp.zeros((1, 384, 384, 3)))

    if args.weights:
        import os

        from lkgd_tpu.utils import porting

        for name, port, template in (
                ("unet", porting.port_svd_unet, unet_params),
                ("vae", porting.port_temporal_vae, vae_params),
                ("image_encoder", porting.port_clip_vision, clip_params)):
            path = os.path.join(args.weights, f"{name}.safetensors")
            if os.path.exists(path):
                sd = porting.load_safetensors(path)
                loaded = port(sd, template, strict=False)
                if name == "unet":
                    unet_params = loaded
                elif name == "vae":
                    vae_params = loaded
                else:
                    clip_params = loaded
                print(f"loaded {name} from {path}")

    # ---- frozen-encoder batch preprocessing (reference :1455-1530)
    scaling = 0.18215

    @jax.jit
    def preprocess(vp, cp, vitp, pixel_values, rng):
        # frozen-encoder params travel as ARGS (closing over them captures ~5 GB of
        # constants into the jaxpr). pixel_values (B, T+1, H, W, 3) in [-1, 1].
        frames = pixel_values[:, :-1]
        if args.mode == "trans":
            # joint batch: INTERLEAVE [video, time-flipped video] per sample so the
            # tiled stream masks pair them; the flipped stream conditions on the LAST
            # frame (train_svd_trans_lora.py:1385-1430)
            frames = jnp.stack([frames, frames[:, ::-1]], axis=1)
            frames = frames.reshape((-1,) + frames.shape[2:])
        b, t = frames.shape[:2]
        flat = frames.reshape((b * t,) + frames.shape[2:])
        latents = vae.apply(vp, flat, method=AutoencoderKLTemporalDecoder.encode_mode)
        latents = latents.reshape((b, t) + latents.shape[1:]) * scaling
        cond_img = frames[:, 0]
        noise = jax.random.normal(rng, cond_img.shape) * 0.02
        cond_latents = vae.apply(vp, cond_img + noise,
                                 method=AutoencoderKLTemporalDecoder.encode_mode)
        raw01 = (frames + 1.0) / 2.0
        clip_in = resize_with_antialiasing(raw01[:, 0] * 2.0 - 1.0, (224, 224))
        clip_in = clip_normalize((clip_in + 1.0) / 2.0)
        emb = clip.apply(cp, clip_in)[:, None, :]
        domain = encode_knowledge_features(domain_vit, vitp, frames)
        return {"latents": latents, "cond_latents": cond_latents,
                "image_embeddings": emb, "domain_features": domain,
                "flow_features": domain}

    optimizer = make_optimizer(args.learning_rate, trainable_predicate=trainable,
                               use_8bit=args.use_8bit_adam)
    train_step_core = jax.jit(make_svd_train_step(
        unet, optimizer,
        SVDTrainConfig(conditioning_dropout_prob=args.conditioning_dropout_prob,
                       tie_stream_pairs=args.mode == "trans")), donate_argnums=(0,))

    # two separately-jitted stages; the composition must NOT be re-jitted (that would
    # inline the frozen encoder params as multi-GB jaxpr constants)
    def train_step(state, batch, rng):
        r1, r2 = jax.random.split(rng)
        proc = preprocess(vae_params, clip_params, vit_params, batch["pixel_values"], r1)
        return train_step_core(state, proc, r2)

    mesh = meshlib.make_mesh()
    state = init_train_state(unet_params, optimizer)
    state = jax.device_put(state, meshlib.replicated(mesh))

    ds = MiniDataset(args.video_folder, sample_size=(args.height, args.width),
                     sample_n_frames=args.num_frames)
    loader = PrefetchLoader(ds, batch_size=B, sharding=meshlib.batch_sharding(mesh))

    # ---- in-training validation sampling (reference train_svd_lora.py:1750-1832:
    # render full-pipeline clips with the CURRENT trained params every N steps)
    validation_fn = None
    if args.validation_image and args.validation_every:
        import os

        import numpy as np

        from lkgd_tpu.data.video_io import read_image
        from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline, SVDPipelineConfig
        from lkgd_tpu.training.variants import make_validation_sampler

        def _load(path):
            img = read_image(path)
            if img.shape[:2] != (args.height, args.width):
                from PIL import Image

                img = np.asarray(
                    Image.fromarray((img * 255).astype(np.uint8)).resize(
                        (args.width, args.height), Image.BICUBIC), np.float32) / 255.0
            return img

        pcfg = SVDPipelineConfig(height=args.height, width=args.width,
                                 num_frames=args.num_frames,
                                 num_inference_steps=args.num_validation_steps,
                                 decode_chunk_size=min(args.num_frames, 8))
        if args.mode == "trans":
            from lkgd_tpu.pipelines.svd_trans import StableVideoDiffusionTransPipeline

            if len(args.validation_image) % 2:
                raise SystemExit("trans validation consumes --validation-image in "
                                 "[start, end] pairs — give an even number")
            tpipe = StableVideoDiffusionTransPipeline(
                config=pcfg, unet_config=unet_config, dtype=jnp.float32)
            sampler = lambda prm, pair, rng: tpipe(prm, pair[0], pair[1], rng=rng)
            images = [np.stack([_load(a), _load(b)])
                      for a, b in zip(args.validation_image[::2],
                                      args.validation_image[1::2])]
        else:
            vpipe = StableVideoDiffusionPipeline(
                config=pcfg, unet_config=unet_config, dtype=jnp.float32)
            sampler = lambda prm, img, rng: vpipe(prm, img, rng=rng)
            images = [_load(path)[None] for path in args.validation_image]
        validation_fn = make_validation_sampler(
            sampler, {"vae": vae_params, "image_encoder": clip_params}, images,
            out_dir=os.path.join(args.output_dir, "validation"))

    from lkgd_tpu.utils.trackers import make_tracker

    trainer = Trainer(train_step, state,
                      TrainerConfig(output_dir=args.output_dir, max_steps=args.max_steps,
                                    checkpoint_every=args.checkpoint_every,
                                    validation_every=args.validation_every or None),
                      jit_step=False, validation_fn=validation_fn,
                      tracker=make_tracker(args.report_to, args.output_dir,
                                           run_name=f"svd_{args.mode}"))
    trainer.restore_latest()
    final = trainer.fit(iter(loader))

    n = export_trainable_safetensors(
        final.params, trainable, f"{args.output_dir}/model.safetensors")
    print(f"exported {n} trainable tensors to {args.output_dir}/model.safetensors")


if __name__ == "__main__":
    main()
