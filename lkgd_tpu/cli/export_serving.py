"""Serving-artifact exporter — compile-once-ship deployment packaging.

The reference deploys by shipping Python + torch + checkpoints and re-tracing on every
host (`run_models/*.py`, `gradios/*`). TPU-native serving can do better: ``jax.export``
lowers the jitted pipeline programs to versioned StableHLO, serialized to disk with a
JSON manifest of the argument tree (shapes/dtypes). A serving host then needs only
``jax.export.deserialize(blob).call(params, ...)`` — no model code, no re-trace, and
the artifact is cross-platform (lowered for BOTH tpu and cpu here, so the exact same
unit smoke-tests on a CPU host and serves on TPU).

Artifacts are weights-separated: params travel as call arguments, so one program blob
pairs with any checkpoint of the same architecture (LoRA-merged or base).

  # package the CogVideoX I2V latent program + VAE decode
  python -m lkgd_tpu.cli.export_serving --model cogvideox --tiny --output art/
  # verify a host can serve from the artifact alone
  python -m lkgd_tpu.cli.export_serving --load art/ --smoke
"""

from __future__ import annotations

import argparse
import json
import os


def _specs(tree):
    import jax

    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def export_cogvideox(output_dir: str, tiny: bool = False, platforms=("tpu", "cpu"),
                     scheduler: str = "dpm"):
    """Export the I2V denoise program (DiT scan, CFG, scheduler fused in) and the
    chunked VAE decode as two artifacts + manifest."""
    import jax
    import jax.numpy as jnp

    from lkgd_tpu.models.cogvideox import CogVideoXConfig
    from lkgd_tpu.models.vae_cogvideox import (AutoencoderKLCogVideoX,
                                               CogVideoXVAEConfig)
    from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                                  CogVideoXPipelineConfig)

    tcfg = CogVideoXConfig.tiny() if tiny else CogVideoXConfig.cogvideox_5b_i2v()
    vcfg = CogVideoXVAEConfig.tiny() if tiny else CogVideoXVAEConfig()
    pcfg = (CogVideoXPipelineConfig(height=32, width=32, num_frames=9,
                                    num_inference_steps=2, scheduler=scheduler,
                                    vae_scale_factor_spatial=4)
            if tiny else CogVideoXPipelineConfig(scheduler=scheduler))
    dtype = jnp.float32 if tiny else jnp.bfloat16
    pipe = CogVideoXImageToVideoPipeline(pcfg, tcfg, dtype=dtype)
    vae = AutoencoderKLCogVideoX(vcfg, dtype=dtype)

    params = jax.eval_shape(pipe.init_params, jax.random.PRNGKey(0))
    b = 1
    prompt = jax.ShapeDtypeStruct((b, tcfg.max_text_seq_length, tcfg.text_embed_dim),
                                  jnp.float32)
    img = jax.ShapeDtypeStruct((b, pcfg.latent_height, pcfg.latent_width,
                                tcfg.out_channels), jnp.float32)
    seed = jax.ShapeDtypeStruct((), jnp.uint32)

    def denoise(p, prompt_embeds, image_latents, seed):
        rng = jax.random.PRNGKey(seed)
        neg = jnp.zeros_like(prompt_embeds)
        return pipe._generate_impl(p, prompt_embeds, neg, image_latents, rng)

    from jax import export as jexport

    os.makedirs(output_dir, exist_ok=True)
    exp = jexport.export(jax.jit(denoise), platforms=list(platforms))(
        params, prompt, img, seed)
    with open(os.path.join(output_dir, "denoise.stablehlo"), "wb") as f:
        f.write(exp.serialize())

    vae_params = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 1, pcfg.height, pcfg.width, 3), jnp.float32))
    lat = jax.ShapeDtypeStruct((b, pcfg.latent_frames, pcfg.latent_height,
                                pcfg.latent_width, tcfg.out_channels), jnp.float32)

    def decode(vp, z):
        frames = vae.apply(vp, jnp.asarray(z, dtype) / vcfg.scaling_factor,
                           method=AutoencoderKLCogVideoX.decode)
        return jnp.clip(frames.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    expd = jexport.export(jax.jit(decode), platforms=list(platforms))(vae_params, lat)
    with open(os.path.join(output_dir, "decode.stablehlo"), "wb") as f:
        f.write(expd.serialize())

    manifest = {
        "model": "cogvideox_i2v", "tiny": tiny, "platforms": list(platforms),
        "pipeline_config": {k: getattr(pcfg, k) for k in
                            ("height", "width", "num_frames", "num_inference_steps",
                             "guidance_scale", "scheduler")},
        "denoise_args": ["params_tree", "prompt_embeds", "image_latents", "seed"],
        "decode_args": ["vae_params_tree", "latents"],
    }
    with open(os.path.join(output_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"exported denoise+decode artifacts to {output_dir} "
          f"(platforms {list(platforms)})")
    return output_dir


def export_svd(output_dir: str, tiny: bool = False, platforms=("tpu", "cpu")):
    """Export the SVD img2vid two-program pair (denoise scan, chunked temporal
    decode) — the reference's run_inference_svd.py serving path."""
    import jax
    import jax.numpy as jnp

    from lkgd_tpu.models.clip_vision import CLIPVisionConfig
    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.vae_temporal import TemporalVAEConfig
    from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline, SVDPipelineConfig

    if tiny:
        pipe = StableVideoDiffusionPipeline(
            config=SVDPipelineConfig(height=64, width=64, num_frames=4,
                                     num_inference_steps=2, decode_chunk_size=2),
            unet_config=SVDUNetConfig(
                block_out_channels=(32, 64),
                down_block_types=("CrossAttnDownBlockSpatioTemporal",
                                  "DownBlockSpatioTemporal"),
                up_block_types=("UpBlockSpatioTemporal",
                                "CrossAttnUpBlockSpatioTemporal"),
                layers_per_block=1, num_attention_heads=(2, 4),
                cross_attention_dim=32),
            vae_config=TemporalVAEConfig(block_out_channels=(32, 64, 64),
                                         layers_per_block=1),
            clip_config=CLIPVisionConfig.tiny(), dtype=jnp.float32)
    else:
        pipe = StableVideoDiffusionPipeline(
            config=SVDPipelineConfig(), dtype=jnp.bfloat16)
    cfg = pipe.config

    params = jax.eval_shape(pipe.init_params, jax.random.PRNGKey(0))
    image = jax.ShapeDtypeStruct((1, cfg.height, cfg.width, 3), jnp.float32)
    seed = jax.ShapeDtypeStruct((), jnp.uint32)

    def denoise(p, image, seed):
        return pipe._generate_impl(p, image, jax.random.PRNGKey(seed))

    from jax import export as jexport

    os.makedirs(output_dir, exist_ok=True)
    exp = jexport.export(jax.jit(denoise), platforms=list(platforms))(
        params, image, seed)
    with open(os.path.join(output_dir, "denoise.stablehlo"), "wb") as f:
        f.write(exp.serialize())

    lat = jax.ShapeDtypeStruct((1, cfg.num_frames, pipe.latent_height,
                                pipe.latent_width, 4), jnp.float32)
    expd = jexport.export(jax.jit(pipe.decode_latents),
                          platforms=list(platforms))(params["vae"], lat)
    with open(os.path.join(output_dir, "decode.stablehlo"), "wb") as f:
        f.write(expd.serialize())

    manifest = {
        "model": "svd_img2vid", "tiny": tiny, "platforms": list(platforms),
        "pipeline_config": {k: getattr(cfg, k) for k in
                            ("height", "width", "num_frames", "num_inference_steps")},
        "denoise_args": ["params_tree", "image", "seed"],
        "decode_args": ["vae_params_tree", "latents"],
    }
    with open(os.path.join(output_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"exported denoise+decode artifacts to {output_dir} "
          f"(platforms {list(platforms)})")
    return output_dir


def load_and_smoke(artifact_dir: str):
    """Prove a serving host needs only the artifacts: deserialize, build random params
    matching the embedded shapes, run denoise -> decode."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    with open(os.path.join(artifact_dir, "manifest.json")) as f:
        manifest = json.load(f)
    progs = {}
    for name in ("denoise", "decode"):
        with open(os.path.join(artifact_dir, f"{name}.stablehlo"), "rb") as f:
            progs[name] = jexport.deserialize(f.read())

    def materialize(exported):
        key = jax.random.PRNGKey(0)
        flat = []
        for i, s in enumerate(exported.in_avals):
            if jnp.issubdtype(s.dtype, jnp.floating):
                flat.append(jax.random.normal(jax.random.fold_in(key, i), s.shape,
                                              s.dtype) * 0.02)
            else:
                flat.append(jnp.zeros(s.shape, s.dtype))
        return jax.tree.unflatten(exported.in_tree, flat)

    d_args, d_kwargs = materialize(progs["denoise"])
    latents = progs["denoise"].call(*d_args, **d_kwargs)
    (vae_params, _), v_kwargs = materialize(progs["decode"])
    frames = progs["decode"].call(vae_params, latents, **v_kwargs)
    assert bool(jnp.isfinite(jnp.asarray(frames)).all())
    print(f"smoke OK: {manifest['model']} latents {jnp.asarray(latents).shape} -> "
          f"frames {jnp.asarray(frames).shape}")
    return frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["cogvideox", "svd"], default="cogvideox")
    p.add_argument("--output", default="serving_artifacts")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    p.add_argument("--scheduler", choices=["ddim", "dpm"], default="dpm",
                   help="sampler baked into the CogVideoX denoise artifact (matches "
                   "run_inference_cogvideox.py's default dpm)")
    p.add_argument("--load", help="artifact dir: deserialize and smoke instead of export")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()
    if args.load:
        load_and_smoke(args.load)
    elif args.model == "svd":
        export_svd(args.output, tiny=args.tiny, platforms=tuple(args.platforms))
    else:
        export_cogvideox(args.output, tiny=args.tiny, platforms=tuple(args.platforms),
                         scheduler=args.scheduler)


if __name__ == "__main__":
    main()
