"""CogVideoX I2V LoRA fine-tuning CLI — `CogVideo-main/finetune/train.py` +
`models/cogvideox_i2v/lora_trainer.py` analog.

Trains LoRA (r=128 on to_q/k/v/out by default, per the reference's args schema) + the
quaternion knowledge-fusion modules on precomputed latents/prompt embeddings from the
native tensor cache (build it with cli.precompute_cache — the i2v_dataset cache analog).

  python -m lkgd_tpu.cli.train_cogvideox_lora --cache cache.lkgd --output-dir out \
      --rank 128 --learning-rate 1e-4 --max-steps 1000
"""

from __future__ import annotations

import argparse


def main():
    from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--cache", required=True, help="tensor cache with latents/prompt_embeds")
    p.add_argument("--output-dir", default="output_cogvideox_lora")
    p.add_argument("--rank", type=int, default=128)
    p.add_argument("--lora-alpha", type=float, default=64.0)  # reference args.py defaults
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=1000)
    p.add_argument("--checkpoint-every", type=int, default=200)
    p.add_argument("--mode", choices=["i2v", "t2v"], default="i2v",
                   help="t2v drops the image-condition channels (reference cogvideox_t2v/lora_trainer.py)")
    p.add_argument("--tiny", action="store_true", help="tiny model (smoke/testing)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize transformer blocks in the backward pass "
                   "(activation-checkpointing; required for 5B full-length training)")
    p.add_argument("--full-finetune", action="store_true",
                   help="SFT: train ALL transformer parameters instead of LoRA "
                   "adapters (reference CogVideo-main finetune sft mode; combine "
                   "with --remat and ZeRO opt-state sharding at scale)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--use-8bit-adam", action="store_true",
                   help="int8 Adam moments (training/optim8bit.py; the reference CLIs "
                        "expose the same bitsandbytes switch)")
    p.add_argument("--weights",
                   help="safetensors dir with transformer.safetensors (+ optionally "
                        "vae_3d.safetensors for validation decode) — fine-tune FROM the "
                        "pretrained model like the reference lora_trainer (same layout "
                        "as run_inference_cogvideox --weights)")
    p.add_argument("--report-to", choices=["jsonl", "tensorboard", "wandb"],
                   default="jsonl",
                   help="metrics tracker mirror (reference tracker_name/--report_to); "
                        "JSONL logging is always on")
    p.add_argument("--validation-every", type=int, default=0,
                   help="every N steps, denoise a clip from the first cached sample's "
                        "conditioning with the CURRENT params (reference trainer "
                        "validation); writes latents .npy, and a GIF when --weights "
                        "includes vae_3d.safetensors")
    p.add_argument("--num-validation-steps", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lkgd_tpu.data.datasets import PrefetchLoader
    from lkgd_tpu.data.tensor_cache import PrecomputedLatentDataset
    from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D
    from lkgd_tpu.models.configs import LoraRouter, LoraRule
    from lkgd_tpu.pipelines.cogvideox_i2v import make_cogvideox_train_step
    from lkgd_tpu.training.train_state import init_train_state, make_optimizer
    from lkgd_tpu.training.trainer import Trainer, TrainerConfig, export_trainable_safetensors

    lora = (LoraRouter() if args.full_finetune
            else LoraRouter(rules=(LoraRule(
                "*attn1*", "cog", args.rank, args.lora_alpha,
                projections=("to_q", "to_k", "to_v", "to_out")),)))
    cfg = (CogVideoXConfig.tiny(lora=lora) if args.tiny
           else CogVideoXConfig.cogvideox_5b_i2v(lora=lora))
    if args.remat:
        import dataclasses

        cfg = dataclasses.replace(cfg, remat=True)
    if args.mode == "t2v":
        import dataclasses

        # T2V checkpoints take bare noise latents (no image-condition channels)
        cfg = dataclasses.replace(cfg, in_channels=cfg.out_channels)
    model = CogVideoXTransformer3D(cfg, dtype=jnp.bfloat16 if not args.tiny else jnp.float32)

    class _Adapted:
        """Adapt cache field names: SVD-flavored caches store cond_latents /
        image_embeddings; the CogVideoX step wants image_latents / prompt_embeds."""

        def __init__(self, base, text_dim):
            self.base = base
            self.text_dim = text_dim

        def __len__(self):
            return len(self.base)

        def __getitem__(self, i):
            s = dict(self.base[i])
            if "image_latents" not in s and "cond_latents" in s:
                s["image_latents"] = s.pop("cond_latents")
            if "prompt_embeds" not in s:
                emb = s.get("image_embeddings")
                if emb is not None:
                    import numpy as _np

                    e = _np.asarray(emb).reshape(-1)
                    reps = -(-self.text_dim // e.size)
                    s["prompt_embeds"] = _np.tile(e, reps)[: self.text_dim][None, :].repeat(
                        8, 0).astype(_np.float32)
                else:
                    raise KeyError("cache lacks prompt_embeds/image_embeddings")
            s.pop("image_embeddings", None)
            return s

    ds = _Adapted(PrecomputedLatentDataset(args.cache), 64 if args.tiny else 4096)
    if len(ds) == 0:
        raise SystemExit("cache has no samples with latents")
    sample = ds[0]
    lat = sample["latents"]
    prompt = sample["prompt_embeds"]
    B = args.batch_size

    rng = jax.random.PRNGKey(args.seed)
    dom0 = jnp.zeros((B, 1, 1000))
    params = model.init(
        rng, jnp.zeros((B,) + lat.shape[:-1] + (cfg.in_channels,)),
        jnp.zeros((B,) + prompt.shape), jnp.zeros((B,)),
        domain_features=dom0, flow_features=dom0)

    vae_params = None
    if args.weights:
        import os

        from lkgd_tpu.utils import porting

        t_path = os.path.join(args.weights, "transformer.safetensors")
        if os.path.exists(t_path):
            params = porting.port_cogvideox(porting.load_safetensors(t_path), params,
                                            strict=False)
            print(f"loaded transformer from {t_path}")
        v_path = os.path.join(args.weights, "vae_3d.safetensors")
        if os.path.exists(v_path):
            from lkgd_tpu.models.vae_cogvideox import (AutoencoderKLCogVideoX,
                                                       CogVideoXVAEConfig)

            vcfg = CogVideoXVAEConfig.tiny() if args.tiny else CogVideoXVAEConfig()
            vae = AutoencoderKLCogVideoX(vcfg, dtype=model.dtype)
            vae_params = vae.init(rng, jnp.zeros((1, 1, 64, 64, 3)))
            vae_params = porting.port_state_dict(porting.load_safetensors(v_path),
                                                 vae_params, strict=False)
            print(f"loaded vae from {v_path} (validation decode enabled)")

    if args.full_finetune:
        trainable = lambda path: True
    else:
        trainable = lambda path: "lora_" in path or "knowledge_fusion" in path
    optimizer = make_optimizer(args.learning_rate, trainable_predicate=trainable,
                               use_8bit=args.use_8bit_adam)
    step = make_cogvideox_train_step(model, optimizer, mode=args.mode)
    state = init_train_state(params, optimizer)

    # ---- in-training validation: denoise from the first cached sample's conditioning
    # (reference CogVideo-main/finetune/trainer.py validation loop)
    validation_fn = None
    if args.validation_every:
        import os

        from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                                      CogVideoXPipelineConfig,
                                                      CogVideoXTextToVideoPipeline)

        f_lat, vh, vw = lat.shape[0], lat.shape[1], lat.shape[2]
        pcfg = CogVideoXPipelineConfig(
            height=vh * 8, width=vw * 8, num_frames=(f_lat - 1) * 4 + 1,
            num_inference_steps=args.num_validation_steps)
        vpipe = ((CogVideoXImageToVideoPipeline if args.mode == "i2v"
                  else CogVideoXTextToVideoPipeline)
                 (config=pcfg, transformer_config=cfg, dtype=model.dtype))
        val_sample = ds[0]
        val_dir = os.path.join(args.output_dir, "validation")
        os.makedirs(val_dir, exist_ok=True)

        def validation_fn(state, step_no):
            prm = {"transformer": state.ema_params if state.ema_params is not None
                   else state.params}
            pe = jnp.asarray(val_sample["prompt_embeds"])[None]
            vrng = jax.random.PRNGKey(step_no)
            if args.mode == "i2v":
                lat_out = vpipe(prm, pe, jnp.asarray(val_sample["image_latents"])[None],
                                rng=vrng)
            else:
                lat_out = vpipe(prm, pe, rng=vrng)
            np.save(os.path.join(val_dir, f"step{step_no}_latents.npy"),
                    np.asarray(lat_out))
            if vae_params is not None:
                from lkgd_tpu.data.video_io import write_video
                from lkgd_tpu.models.vae_cogvideox import chunked_decode

                frames = chunked_decode(vae, vae_params,
                                        jnp.asarray(lat_out) / vcfg.scaling_factor,
                                        chunk_latent_frames=2)
                video = np.asarray(jnp.clip(frames.astype(jnp.float32) / 2.0 + 0.5,
                                            0.0, 1.0))
                write_video(os.path.join(val_dir, f"step{step_no}.gif"),
                            video[0][:pcfg.num_frames], fps=8)
            return {"num_samples": 1}

    from lkgd_tpu.utils.trackers import make_tracker

    loader = PrefetchLoader(ds, batch_size=B)
    trainer = Trainer(step, state, TrainerConfig(
        output_dir=args.output_dir, max_steps=args.max_steps,
        checkpoint_every=args.checkpoint_every,
        validation_every=args.validation_every or None),
        validation_fn=validation_fn,
        tracker=make_tracker(args.report_to, args.output_dir,
                             run_name=f"cogvideox_{args.mode}"))
    trainer.restore_latest()
    final = trainer.fit(iter(loader))
    n = export_trainable_safetensors(final.params, trainable,
                                     f"{args.output_dir}/model.safetensors")
    print(f"exported {n} trainable tensors")


if __name__ == "__main__":
    main()
