"""Checkpoint parity verifier — the fp32-tolerance report for the driver's parity metric.

Given (a) a real checkpoint (diffusers safetensors layout) and (b) recorded reference
activations (inputs + denoised outputs captured from the PyTorch reference with the same
weights), ports the weights, replays the recorded inputs through our model, and emits a
JSON report of fp32-tolerance agreement. The reference-side recording is a plain ``.npz``
any torch script can produce (keys: ``sample, timestep, encoder_hidden_states,
added_time_ids, output, config``); ``record`` mode produces the same format from OUR
model so the harness is testable end-to-end without gated weights
(tests/test_verify_parity.py) and so regressions can be caught self-referentially.

  # harness self-test / regression fingerprint
  python -m lkgd_tpu.cli.verify_parity record --config tiny --out rec.npz
  # the driver's parity check (BASELINE.json: fp32 tolerance on denoised latents)
  python -m lkgd_tpu.cli.verify_parity check --record rec.npz \
      --checkpoint /ckpts/svd-xt/unet/diffusion_pytorch_model.safetensors \
      --report parity.json --rtol 1e-4 --atol 1e-4

Reference analog: the torch pipelines load these checkpoints via ``from_pretrained``
(`run_models/run_inference_trans_svd.py`); parity of the UNet denoise step at fp32 is
the strongest single-step equivalence evidence available without a full clip rollout.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


TINY = dict(block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
            up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
            layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64)

COG_FIELDS = ("num_layers", "num_attention_heads", "attention_head_dim", "in_channels",
              "out_channels", "text_embed_dim", "time_embed_dim", "patch_size",
              "patch_size_t", "max_text_seq_length", "use_rope", "knowledge_fusion")


def _config_from_dict(d: dict):
    from lkgd_tpu.models.configs import SVDUNetConfig

    clean = {}
    for f in dataclasses.fields(SVDUNetConfig):
        if f.name in d and f.name not in ("joint", "lora"):
            v = d[f.name]
            clean[f.name] = tuple(v) if isinstance(v, list) else v
    return SVDUNetConfig(**clean)


def _resolve_weights(path: str) -> str:
    if os.path.isfile(path):
        return path
    for cand in ("diffusion_pytorch_model.safetensors",
                 os.path.join("unet", "diffusion_pytorch_model.safetensors"),
                 os.path.join("transformer", "diffusion_pytorch_model.safetensors"),
                 "unet.safetensors", "transformer.safetensors"):
        p = os.path.join(path, cand)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no safetensors found under {path}")


def _build(config_dict: dict, dtype):
    if config_dict.get("model") == "cogvideox":
        import dataclasses as _dc

        from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D

        fields = {f.name for f in _dc.fields(CogVideoXConfig)}
        clean = {k: v for k, v in config_dict.items() if k in fields}
        return CogVideoXTransformer3D(CogVideoXConfig(**clean), dtype=dtype)
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition

    return UNetSpatioTemporalCondition(_config_from_dict(config_dict), dtype=dtype)


def _record_cogvideox(args) -> None:
    """CogVideoX record mode: one DiT denoise forward (the second model family;
    reference CogVideo-main/finetune/models/cogvideox_i2v/cogvideox_transformer_3d.py)."""
    import jax
    import jax.numpy as jnp

    from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D

    cfg = (CogVideoXConfig.tiny() if args.config == "tiny"
           else CogVideoXConfig.cogvideox_5b_i2v())
    if args.config_json:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, **json.loads(args.config_json))
    model = CogVideoXTransformer3D(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(args.seed)
    b, t = args.batch, args.frames
    h, w = args.height // 8, args.width // 8
    sample = rng.standard_normal((b, t, h, w, cfg.in_channels)).astype(np.float32)
    text = rng.standard_normal((b, cfg.max_text_seq_length,
                                cfg.text_embed_dim)).astype(np.float32) * 0.3
    timestep = np.full((b,), 500.0, np.float32)

    if args.checkpoint:
        import jax as _jax

        from lkgd_tpu.utils import porting

        template = _jax.eval_shape(lambda: model.init(
            _jax.random.PRNGKey(0), sample, text, timestep))
        params = porting.port_cogvideox(
            porting.load_state_dict(_resolve_weights(args.checkpoint)), template,
            strict=not args.lenient)
    else:
        params = model.init(jax.random.PRNGKey(args.seed), sample, text, timestep)
    out = np.asarray(jax.jit(model.apply)(params, sample, text, timestep))
    np.savez_compressed(
        args.out, sample=sample, timestep=timestep, encoder_hidden_states=text,
        output=out,
        config=json.dumps({"model": "cogvideox",
                           **{k: getattr(cfg, k) for k in COG_FIELDS}}))
    print(f"recorded {out.shape} cogvideox denoise output -> {args.out}")


def _build_pipeline(args, dtype):
    """Tiny end-to-end SVD pipeline for the whole-loop parity rung (the BASELINE.json
    bar is *denoised-latent* parity of the assembled __call__, not one UNet step —
    see tests/test_pipeline_torch_oracle.py for the torch-oracle version of this)."""
    import jax.numpy as jnp  # noqa: F401

    from lkgd_tpu.models.clip_vision import CLIPVisionConfig
    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.vae_temporal import TemporalVAEConfig
    from lkgd_tpu.pipelines.svd import SVDPipelineConfig, StableVideoDiffusionPipeline

    if args.config == "tiny":
        ucfg = SVDUNetConfig(**TINY)
        vcfg = TemporalVAEConfig(block_out_channels=(32, 64), layers_per_block=1)
        ccfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=64,
                                num_layers=2, num_heads=2, intermediate_size=128,
                                projection_dim=64)
    else:  # the real svd-xt geometry
        ucfg, vcfg, ccfg = SVDUNetConfig(), TemporalVAEConfig(), CLIPVisionConfig()
    pcfg = SVDPipelineConfig(height=args.height, width=args.width,
                             num_frames=args.frames,
                             num_inference_steps=args.steps, decode_chunk_size=2)
    return StableVideoDiffusionPipeline(config=pcfg, unet_config=ucfg, vae_config=vcfg,
                                        clip_config=ccfg, dtype=dtype)


def _port_pipeline_params(pipe, checkpoint: str, strict: bool):
    """Port unet/vae/image_encoder from a diffusers-layout checkpoint root."""
    import jax
    import jax.numpy as jnp

    from lkgd_tpu.utils import porting

    rng = jax.random.PRNGKey(0)
    template = jax.eval_shape(lambda: pipe.init_params(rng))
    unet_sd = porting.load_state_dict(_resolve_weights(os.path.join(checkpoint, "unet")))
    vae_sd = porting.load_state_dict(_resolve_weights(os.path.join(checkpoint, "vae")))
    clip_path = os.path.join(checkpoint, "image_encoder")
    for cand in ("model.safetensors", "diffusion_pytorch_model.safetensors"):
        if os.path.isfile(os.path.join(clip_path, cand)):
            clip_path = os.path.join(clip_path, cand)
            break
    clip_sd = porting.load_state_dict(clip_path)
    return {
        "unet": porting.port_svd_unet(unet_sd, template["unet"], strict=strict),
        "vae": porting.port_temporal_vae(vae_sd, template["vae"], strict=strict),
        "image_encoder": porting.port_clip_vision(clip_sd, template["image_encoder"],
                                                  strict=strict),
    }


def record_pipeline(args) -> None:
    """Record the FULL pipeline loop: image + injected noise -> denoised latents."""
    import jax
    import jax.numpy as jnp

    pipe = _build_pipeline(args, jnp.float32)
    rng = np.random.default_rng(args.seed)
    b = args.batch
    image = rng.uniform(size=(b, args.height, args.width, 3)).astype(np.float32)
    noise_aug = rng.standard_normal((b, args.height, args.width, 3)).astype(np.float32)
    init_noise = rng.standard_normal(
        (b, args.frames, args.height // pipe.vae_scale_factor,
         args.width // pipe.vae_scale_factor, 4)).astype(np.float32)
    if args.checkpoint:
        params = _port_pipeline_params(pipe, args.checkpoint, strict=not args.lenient)
    else:
        params = pipe.init_params(jax.random.PRNGKey(args.seed))
    latents = np.asarray(pipe(params, image, output_type="latent",
                              noise_aug=jnp.asarray(noise_aug),
                              initial_noise=jnp.asarray(init_noise)), np.float32)
    np.savez_compressed(
        args.out, image=image, noise_aug=noise_aug, initial_noise=init_noise,
        latents=latents,
        pipe_config=json.dumps({"model": "svd_pipeline", "config": args.config,
                                "height": args.height, "width": args.width,
                                "frames": args.frames, "steps": args.steps}))
    print(f"recorded pipeline latents {latents.shape} -> {args.out}")


def check_pipeline(args, rec) -> int:
    import argparse as _a

    import jax.numpy as jnp

    meta = json.loads(str(rec["pipe_config"]))
    pargs = _a.Namespace(config=meta["config"], height=meta["height"],
                         width=meta["width"], frames=meta["frames"],
                         steps=meta["steps"])
    pipe = _build_pipeline(pargs, jnp.float32)
    params = _port_pipeline_params(pipe, args.checkpoint, strict=not args.lenient)
    got = np.asarray(pipe(params, rec["image"], output_type="latent",
                          noise_aug=jnp.asarray(rec["noise_aug"]),
                          initial_noise=jnp.asarray(rec["initial_noise"])), np.float32)
    want = np.asarray(rec["latents"], np.float32)
    abs_err = np.abs(got - want)
    report = {
        "mode": "pipeline", "checkpoint": args.checkpoint, "record": args.record,
        "shape": list(want.shape),
        "max_abs_err": float(abs_err.max()),
        "mean_abs_err": float(abs_err.mean()),
        "rtol": args.rtol, "atol": args.atol,
        "pass": bool(np.allclose(got, want, rtol=args.rtol, atol=args.atol)),
    }
    print(json.dumps(report, indent=2))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
    return 0 if report["pass"] else 1


def record(args) -> None:
    import jax
    import jax.numpy as jnp

    if args.model == "cogvideox":
        return _record_cogvideox(args)
    if args.model == "svd_pipeline":
        return record_pipeline(args)
    cfg_dict = TINY if args.config == "tiny" else {}
    if args.config_json:
        cfg_dict = {**cfg_dict, **json.loads(args.config_json)}
    unet = _build(cfg_dict, jnp.float32)
    c = unet.config
    b, t = args.batch, args.frames
    h, w = args.height // 8, args.width // 8
    rng = np.random.default_rng(args.seed)
    sample = rng.standard_normal((b, t, h, w, c.in_channels)).astype(np.float32)
    timestep = np.full((b,), 0.25 * np.log(7.0), np.float32)
    ehs = rng.standard_normal((b, 1, c.cross_attention_dim)).astype(np.float32)
    add_ids = np.asarray([[6.0, 127.0, 0.02]] * b, np.float32)

    if args.checkpoint:
        from lkgd_tpu.utils import porting

        template = jax.eval_shape(lambda: unet.init(
            jax.random.PRNGKey(0), sample, timestep, ehs, add_ids))
        params = porting.port_svd_unet(
            porting.load_safetensors(_resolve_weights(args.checkpoint)), template,
            strict=not args.lenient)
    else:
        params = unet.init(jax.random.PRNGKey(args.seed), sample, timestep, ehs, add_ids)
    out = np.asarray(jax.jit(unet.apply)(params, sample, timestep, ehs, add_ids))
    np.savez_compressed(
        args.out, sample=sample, timestep=timestep, encoder_hidden_states=ehs,
        added_time_ids=add_ids, output=out,
        config=json.dumps({**{k: getattr(unet.config, k) for k in
                              ("in_channels", "out_channels", "layers_per_block",
                               "cross_attention_dim", "num_frames")},
                           **{k: list(getattr(unet.config, k)) for k in
                              ("block_out_channels", "down_block_types",
                               "up_block_types", "num_attention_heads")}}))
    print(f"recorded {out.shape} denoise output -> {args.out}")


def check(args) -> int:
    import jax
    import jax.numpy as jnp

    rec = np.load(args.record, allow_pickle=False)
    if "pipe_config" in rec:
        return check_pipeline(args, rec)
    cfg_dict = json.loads(str(rec["config"]))
    unet = _build(cfg_dict, jnp.float32)
    sample = rec["sample"]
    is_cog = cfg_dict.get("model") == "cogvideox"
    if is_cog:
        inputs = (sample, rec["encoder_hidden_states"], rec["timestep"])
    else:
        inputs = (sample, rec["timestep"], rec["encoder_hidden_states"],
                  rec["added_time_ids"])

    from lkgd_tpu.utils import porting

    template = jax.eval_shape(lambda: unet.init(jax.random.PRNGKey(0), *inputs))
    porter = porting.port_cogvideox if is_cog else porting.port_svd_unet
    params = porter(
        porting.load_state_dict(_resolve_weights(args.checkpoint)), template,
        strict=not args.lenient)
    got = np.asarray(jax.jit(unet.apply)(params, *inputs), np.float32)
    want = np.asarray(rec["output"], np.float32)

    abs_err = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1e-8)
    report = {
        "checkpoint": args.checkpoint,
        "record": args.record,
        "shape": list(want.shape),
        "max_abs_err": float(abs_err.max()),
        "mean_abs_err": float(abs_err.mean()),
        "max_rel_err": float((abs_err / denom).max()),
        "rtol": args.rtol, "atol": args.atol,
        "pass": bool(np.allclose(got, want, rtol=args.rtol, atol=args.atol)),
    }
    print(json.dumps(report, indent=2))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
    return 0 if report["pass"] else 1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)
    pr = sub.add_parser("record")
    pr.add_argument("--out", required=True)
    pr.add_argument("--model", default="svd",
                    choices=["svd", "cogvideox", "svd_pipeline"])
    pr.add_argument("--config", default="tiny", choices=["tiny", "svd-xt"])
    pr.add_argument("--config-json", help="extra SVDUNetConfig field overrides")
    pr.add_argument("--checkpoint", help="optional safetensors to record WITH real weights"
                    " (svd_pipeline: a diffusers checkpoint ROOT with unet/vae/"
                    "image_encoder)")
    pr.add_argument("--lenient", action="store_true")
    pr.add_argument("--batch", type=int, default=2)
    pr.add_argument("--frames", type=int, default=2)
    pr.add_argument("--height", type=int, default=64)
    pr.add_argument("--width", type=int, default=64)
    pr.add_argument("--steps", type=int, default=3,
                    help="svd_pipeline: denoising steps in the recorded loop")
    pr.add_argument("--seed", type=int, default=0)
    pr.set_defaults(fn=record)
    pc = sub.add_parser("check")
    pc.add_argument("--record", required=True)
    pc.add_argument("--checkpoint", required=True)
    pc.add_argument("--report")
    pc.add_argument("--rtol", type=float, default=1e-4)
    pc.add_argument("--atol", type=float, default=1e-4)
    pc.add_argument("--lenient", action="store_true")
    pc.set_defaults(fn=check)
    args = p.parse_args(argv)
    rc = args.fn(args)
    return rc or 0


if __name__ == "__main__":
    raise SystemExit(main())
