"""Headline benchmark: seconds per generated clip (14 frames, 576x1024, 25 Euler steps).

Runs the full jitted img2vid pipeline (CLIP encode -> VAE encode -> 25 CFG-doubled UNet
steps -> chunked temporal VAE decode) on the default device and prints ONE JSON line:
  {"metric": "sec/clip (14f x 576x1024, 25 steps)", "value": ..., "unit": "s",
   "vs_baseline": ...}
vs_baseline = (10 s north-star target from BASELINE.json) / measured — >1 beats the target.

The headline JSON line is (re)printed after EVERY timed rep with the best-so-far value
(flushed), so a driver timeout still leaves a parsable line in the tail; a 60 s stderr
heartbeat shows liveness during long compiles. The LAST stdout line is the final value.

Env overrides:
  LKGD_BENCH_SMALL=1     tiny smoke config
  LKGD_BENCH_REPS=N      timing repetitions (default 3)
  LKGD_BENCH_DEADLINE=S  stop timing reps early past S seconds elapsed (default 1800)
  LKGD_BENCH_PIPELINE=   base (default) | trans | controlnet | smooth | cogvideox |
                         cogvideox_clip | train | vae
      base       the driver metric: plain img2vid (reference run_inference_svd.py)
      trans      LKGD flagship: joint attention (spatial+temporal, attn1n branch per
                 block) + 2 stream-masked r=64 LoRAs, [start, end] frame pair
                 (reference run_inference_trans_svd.py).
                 NOTE: the full 576x1024 joint config exceeds one 16 GB chip even
                 with LKGD_BENCH_SEQ_CFG=1 (r3 queue3/5); run it at the reference's
                 own trans resolution (LKGD_BENCH_SIZE=576x320 -> 20.84 s/clip
                 measured) or shard over a mesh. Same for smooth.
      controlnet ControlNet-SDV residuals on every step (reference run_inference.py).
                 Full 576x1024 works on one chip (36.25 s/clip measured) with the
                 bf16 synthetic param materialization.
      smooth     long-video refiner: 28 frames re-denoised in 14-frame joint chunks
                 (reference run_inference_svd_smooth.py)
      cogvideox  ONE full-size CogVideoX-5B I2V DiT step (49f x 480x720 latents,
                 CFG-doubled, S=17776) — s/step, not s/clip
      train      LKGD fine-tune step (512x512 x 8f, bs1, quaternion+LoRA, remat,
                 full fwd+bwd+optimizer) — s/step (reference train_svd_lora.sh)
      vae        SVD temporal VAE decode (14f x 576x1024) + CogVideoX conv-cached
                 chunked decode (49f x 480x720) — seconds
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 10.0  # s/clip target from BASELINE.json


def _bf16(params):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)


def _full_unet(num_frames=14, **kw):
    from lkgd_tpu.models.configs import SVDUNetConfig

    return SVDUNetConfig(num_frames=num_frames, **kw)


def _joint_unet(num_frames=14, lora_rank=64):
    """Full-size trans config: joint attention on spatial+temporal blocks, flip, and the
    reference's stream-masked adapters (yx on the joint branch, xy on temporal attn1;
    train_svd_trans_lora.py masks at rank 64, train_scripts/train_svd_trans_lora.sh)."""
    from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, LoraRule

    mask = (0, 1, 0, 1)
    inv = tuple(1 - m for m in mask)
    return _full_unet(
        num_frames=num_frames,
        joint=JointAttentionConfig(post="conv", flip=True, mask=mask, spatial=True,
                                   temporal=True),
        lora=LoraRouter(rules=(
            LoraRule("*attn1n*", "yx_lora", lora_rank, lora_rank, mask),
            LoraRule("*temporal_transformer_blocks*attn1.*", "xy_lora",
                     lora_rank, lora_rank, inv),
        )))


def _pipeline_config(**kw):
    from lkgd_tpu.pipelines.svd import SVDPipelineConfig

    # LKGD_BENCH_SIZE=WxH overrides the clip resolution (e.g. 576x320 — the
    # reference's own trans-training resolution, train_scripts/train_svd_trans_lora.sh)
    size = os.environ.get("LKGD_BENCH_SIZE")
    w, h = (int(v) for v in size.split("x")) if size else (1024, 576)
    base = dict(height=h, width=w, num_frames=14, num_inference_steps=25,
                decode_chunk_size=14,
                # CFG halves run sequentially (halved peak activation HBM) — the
                # deployment setting for the 4-row trans batch on one 16 GB chip
                sequential_cfg=bool(os.environ.get("LKGD_BENCH_SEQ_CFG")),
                # LKGD_BENCH_DEEPCACHE=N: DeepCache approximate serving mode (full
                # UNet every N-th step; default 1 = exact). NOT the headline path.
                deep_cache_interval=int(os.environ.get("LKGD_BENCH_DEEPCACHE", "1")))
    base.update(kw)
    return SVDPipelineConfig(**base)


def _emit(label, value):
    """Print the headline JSON line. Called after EVERY timed rep (best-so-far value):
    if the driver's timeout kills the process mid-bench, the tail still holds a parsable
    line (r4's official artifact was rc=124/parsed=null while the real number existed
    only in the builder's log — never again)."""
    print(json.dumps({
        "metric": label,
        "value": round(float(value), 3),
        "unit": "s",
        "vs_baseline": round(NORTH_STAR / float(value), 3),
    }), flush=True)


def _time(run, reps, label):
    import threading

    start = time.time()
    stop = threading.Event()

    def _beat():  # progress heartbeat so a driver tail shows liveness, not silence
        while not stop.wait(60.0):
            print(f"# heartbeat {time.time() - start:.0f}s", file=sys.stderr, flush=True)

    threading.Thread(target=_beat, daemon=True).start()
    deadline = float(os.environ.get("LKGD_BENCH_DEADLINE", "1800") or 0)
    t0 = time.time()
    out = run()
    # host-fetch a scalar: block_until_ready over the axon relay can return early
    _ = float(jnp.asarray(out).ravel()[0])
    print(f"# compile+first run {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    times = []
    for i in range(reps):
        t0 = time.time()
        out = run()
        _ = float(jnp.asarray(out).ravel()[0])
        times.append(time.time() - t0)
        _emit(label, min(times))
        if deadline and time.time() - start > deadline:
            print(f"# deadline {deadline:.0f}s reached after rep {i + 1}/{reps}",
                  file=sys.stderr, flush=True)
            break
    stop.set()
    value = float(min(times))
    print(f"# times: {[round(t, 3) for t in times]}", file=sys.stderr, flush=True)
    return value


def _rng_image(shape):
    return jnp.asarray(np.random.default_rng(0).uniform(size=shape), jnp.float32)


def bench_base(small, reps):
    from lkgd_tpu.models.clip_vision import CLIPVisionConfig
    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.vae_temporal import TemporalVAEConfig
    from lkgd_tpu.pipelines.svd import StableVideoDiffusionPipeline, SVDPipelineConfig

    if small:
        pipe = StableVideoDiffusionPipeline(
            config=SVDPipelineConfig(height=64, width=64, num_frames=4, num_inference_steps=3,
                                     decode_chunk_size=4),
            unet_config=SVDUNetConfig(
                block_out_channels=(32, 64),
                down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
                up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
                layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=32),
            vae_config=TemporalVAEConfig(block_out_channels=(32, 64, 64), layers_per_block=1),
            clip_config=CLIPVisionConfig.tiny(),
            dtype=jnp.bfloat16,
        )
        label = "sec/clip (smoke config)"
    else:
        pipe = StableVideoDiffusionPipeline(
            config=_pipeline_config(), unet_config=_full_unet(), dtype=jnp.bfloat16)
        label = "sec/clip (14f x 576x1024, 25 steps)"

    t0 = time.time()
    # deployment weight format: bf16 (fp32 params would hold ~7 GB of HBM and force
    # small decode chunks)
    params = _bf16(jax.jit(pipe.init_params)(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    img = _rng_image((1, pipe.config.height, pipe.config.width, 3))
    rng = jax.random.PRNGKey(1)
    return label, _time(lambda: pipe.generate(params, img, rng), reps, label)



def _synthetic_bf16_params(init_fn, *init_args):
    """Materialize params as bf16 random leaves from the eval_shape tree — a perf
    measurement needs realistic shapes, not trained values, and a full fp32 init + cast
    holds ~3x the param bytes transiently (the 2.2B-param joint/controlnet configs OOM
    the 16 GB chip that way; bench_cogvideox has always used this path for its 5.6B)."""
    shapes = jax.eval_shape(init_fn, *init_args)
    leaves, treedef = jax.tree.flatten(shapes)
    key = jax.random.PRNGKey(0)
    out = []
    for i, leaf in enumerate(leaves):
        out.append(jax.random.normal(jax.random.fold_in(key, i), leaf.shape,
                                     jnp.bfloat16) * 0.02)
    return jax.tree.unflatten(treedef, out)


def bench_trans(reps):
    from lkgd_tpu.pipelines.svd_trans import StableVideoDiffusionTransPipeline

    pipe = StableVideoDiffusionTransPipeline(
        config=_pipeline_config(), unet_config=_joint_unet(), dtype=jnp.bfloat16)
    params = _synthetic_bf16_params(pipe.init_params, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    img = _rng_image((2, pipe.config.height, pipe.config.width, 3))  # [start, end]
    rng = jax.random.PRNGKey(1)
    label = (f"sec/clip trans joint-attn (2 streams x 14f x "
             f"{pipe.config.width}x{pipe.config.height}, 25 steps)")
    return label, _time(lambda: pipe.generate(params, img, rng), reps, label)


def bench_controlnet(reps):
    from lkgd_tpu.models.controlnet_svd import ControlNetSDVConfig
    from lkgd_tpu.pipelines.svd_controlnet import StableVideoDiffusionControlNetPipeline

    unet = _full_unet()
    pipe = StableVideoDiffusionControlNetPipeline(
        config=_pipeline_config(), unet_config=unet,
        controlnet_config=ControlNetSDVConfig(unet=unet), dtype=jnp.bfloat16)
    params = _synthetic_bf16_params(pipe.init_params, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    img = _rng_image((1, pipe.config.height, pipe.config.width, 3))
    ctrl = _rng_image((14, pipe.config.height, pipe.config.width, 3))
    rng = jax.random.PRNGKey(1)

    def run():  # control is a kwarg of the denoise program (base generate() lacks it)
        latents = pipe._generate(params, img, rng, control=ctrl)
        return pipe._decode(params["vae"], latents)

    label = (f"sec/clip controlnet-sdv (14f x "
             f"{pipe.config.width}x{pipe.config.height}, 25 steps)")
    return label, _time(run, reps, label)


def bench_smooth(reps):
    from lkgd_tpu.pipelines.svd_smooth import StableVideoDiffusionSmoothPipeline

    total = int(os.environ.get("LKGD_BENCH_SMOOTH_FRAMES", "28"))
    pipe = StableVideoDiffusionSmoothPipeline(
        config=_pipeline_config(), unet_config=_joint_unet(), dtype=jnp.bfloat16,
        start_step=10, total_frames=total)
    params = _synthetic_bf16_params(pipe.init_params, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    video = _rng_image((total, pipe.config.height, pipe.config.width, 3))
    rng = jax.random.PRNGKey(1)
    label = (f"sec/refine smooth ({total}f x {pipe.config.width}x{pipe.config.height}, "
             f"steps 10..25, joint chunks)")
    return label, _time(lambda: pipe.generate(params, video, rng), reps, label)


def bench_train(reps):
    """The LKGD fine-tune step (reference train_svd_lora.py / train_svd_lora.sh config:
    512x512, 8 frames, bs1, quaternion fusion + temporal-attn LoRA r=4 trainable,
    gradient checkpointing): full fwd+bwd+optimizer on one chip, s/step."""
    from lkgd_tpu.models.configs import LoraRouter, LoraRule, SVDUNetConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
    from lkgd_tpu.training.train_state import (SVDTrainConfig, init_train_state,
                                               make_optimizer, make_svd_train_step)

    small = bool(os.environ.get("LKGD_BENCH_SMALL"))
    # int8 Adam moments (optim8bit); "packed" = flat-packed moment layout (same math,
    # O(1) quantization chains — the compile-time fix measured in BASELINE.md r4)
    use_8bit = os.environ.get("LKGD_BENCH_8BIT", "")
    use_8bit = "packed" if use_8bit == "packed" else bool(use_8bit)
    b, t, h, w = (1, 2, 8, 8) if small else (1, 8, 64, 64)  # 512x512 px -> 64x64 latents
    kw = dict(
        num_frames=t, knowledge_fusion=True, remat=True,
        lora=LoraRouter(rules=(
            LoraRule("*temporal_transformer_blocks*attn1.*", "lkgd", 4, 4.0, ()),)))
    if small:
        kw.update(block_out_channels=(32, 64),
                  down_block_types=("CrossAttnDownBlockSpatioTemporal",
                                    "DownBlockSpatioTemporal"),
                  up_block_types=("UpBlockSpatioTemporal",
                                  "CrossAttnUpBlockSpatioTemporal"),
                  layers_per_block=1, num_attention_heads=(2, 4))
    cfg = SVDUNetConfig(**kw)
    unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.bfloat16)
    trainable = lambda path: "lora_" in path or "knowledge_fusion" in path  # noqa: E731
    optimizer = make_optimizer(2e-4, trainable_predicate=trainable, use_8bit=use_8bit)
    train_step = jax.jit(make_svd_train_step(unet, optimizer, SVDTrainConfig()),
                         donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.normal(size=(b, t, h, w, 4)), jnp.float32) * 0.18215,
        "cond_latents": jnp.asarray(rng.normal(size=(b, h, w, 4)), jnp.float32),
        "image_embeddings": jnp.asarray(rng.normal(size=(b, 1, 1024)), jnp.float32),
        "domain_features": jnp.asarray(rng.normal(size=(b, 1, 1024)), jnp.float32),
        "flow_features": jnp.asarray(rng.normal(size=(b, 1, 1024)), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    sample = jnp.concatenate([batch["latents"][:, :, :, :, :],
                              jnp.repeat(batch["cond_latents"][:, None], t, 1)], -1)
    params = unet.init(key, sample, jnp.zeros((b,)), batch["image_embeddings"],
                       jnp.zeros((b, 3)),
                       domain_features=batch["domain_features"],
                       flow_features=batch["flow_features"])
    state = init_train_state(params, optimizer)
    jax.block_until_ready(state.params)

    holder = {"state": state}

    def run():
        holder["state"], loss = train_step(holder["state"], batch, key)
        return loss

    label = ("sec/step train svd-lora (smoke config)" if small else
             "sec/step train svd-lora (512x512 x 8f, bs1, quaternion+LoRA, remat"
             + (", 8-bit adam)" if use_8bit else ")"))
    return label, _time(run, reps, label)


def bench_cogvideox(reps):
    """One full-size CogVideoX-5B DiT step (what the 50-step I2V loop repeats)."""
    from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D

    cfg = CogVideoXConfig.cogvideox_5b_i2v()
    model = CogVideoXTransformer3D(cfg, dtype=jnp.bfloat16)

    b, t, h, w = 2, 13, 60, 90  # CFG-doubled batch; 49f x 480x720 latents
    sample = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, cfg.in_channels),
                               jnp.bfloat16)
    text = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.max_text_seq_length, 4096),
                             jnp.bfloat16) * 0.02
    timestep = jnp.full((b,), 500, jnp.int32)

    # 5B fp32 init would not fit 16 GB HBM: materialize bf16 params leaf-by-leaf from
    # the eval_shape tree (values only need to be non-degenerate for a perf measurement)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, text, timestep)
    leaves, treedef = jax.tree.flatten(shapes)
    key = jax.random.PRNGKey(0)
    params = []
    for i, leaf in enumerate(leaves):
        params.append(jax.random.normal(jax.random.fold_in(key, i), leaf.shape,
                                        jnp.bfloat16) * 0.02)
    params = jax.tree.unflatten(treedef, params)
    jax.block_until_ready(params)
    n = sum(int(np.prod(l.shape)) for l in leaves)
    print(f"# cogvideox params: {n/1e9:.2f}B bf16", file=sys.stderr)

    fwd = jax.jit(model.apply)
    label = "sec/step cogvideox-5b DiT (CFG-doubled, 13x30x45+226 tokens)"
    return label, _time(lambda: fwd(params, sample, text, timestep), reps, label)


def bench_vae(reps):
    """VAE decode paths: the SVD temporal decode inside the headline clip (~0.9 s of
    the 14f x 576x1024 budget) and the CogVideoX conv-cached chunked decode
    (49f x 480x720, the serving ladder). Primary metric = SVD decode seconds."""
    from lkgd_tpu.models.vae_temporal import (AutoencoderKLTemporalDecoder,
                                              TemporalVAEConfig)

    small = bool(os.environ.get("LKGD_BENCH_SMALL"))
    vcfg = (TemporalVAEConfig(block_out_channels=(32, 64), layers_per_block=1)
            if small else TemporalVAEConfig())
    vae = AutoencoderKLTemporalDecoder(vcfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda: vae.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 64, 64, 3)), num_frames=1))()
    params = _bf16(params)
    t, zh, zw = (4, 16, 16) if small else (14, 72, 128)
    z = jax.random.normal(jax.random.PRNGKey(1), (t, zh, zw, 4), jnp.bfloat16)
    dec = jax.jit(lambda p, zz: vae.apply(p, zz, t,
                                          method=AutoencoderKLTemporalDecoder.decode))

    from lkgd_tpu.models.vae_cogvideox import (AutoencoderKLCogVideoX,
                                               CogVideoXVAEConfig, chunked_decode)

    ccfg = CogVideoXVAEConfig.tiny() if small else CogVideoXVAEConfig()
    cvae = AutoencoderKLCogVideoX(ccfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(cvae.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 1, 64, 64, 3)))
    leaves, treedef = jax.tree.flatten(shapes)
    cparams = jax.tree.unflatten(treedef, [
        jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(0), i), l.shape,
                          jnp.bfloat16) * 0.02 for i, l in enumerate(leaves)])
    ct, ch, cw = (3, 8, 8) if small else (13, 60, 90)
    zc = jax.random.normal(jax.random.PRNGKey(2), (1, ct, ch, cw, ccfg.latent_channels),
                           jnp.bfloat16) * 0.5
    cog_s = _time(lambda: chunked_decode(cvae, cparams, zc, chunk_latent_frames=2),
                  max(1, reps - 1),
                  f"sec cogvideox chunked decode ({4 * (ct - 1) + 1}f x {ch * 8}x{cw * 8}, chunk=2)")
    print(f"# cogvideox chunked decode ({4 * (ct - 1) + 1}f x {ch * 8}x{cw * 8}, "
          f"chunk=2): {cog_s:.3f} s", file=sys.stderr)
    # the primary (SVD decode) metric is timed LAST so its line is the final stdout line
    label = f"sec SVD VAE decode ({t}f x {zh * 8}x{zw * 8})"
    svd_s = _time(lambda: dec(params, z), reps, label)
    return label, svd_s


def bench_mesh_dryrun():
    """Compile (not run) the FULL-SIZE sharded inference program on a virtual 8-device
    CPU mesh and report partitioned-HLO stats + a v5e-8 sec/clip projection.

    The <10 s north star is a v5e-8 figure and only one chip is reachable here; this mode
    turns the multi-chip story into numbers: per-step bytes over ICI by collective
    (parallel/collective_audit.py) and a roofline projection combining the MEASURED
    single-chip step time with v5e ICI bandwidth. Runs on the CPU backend (set by the
    caller via jax.config) so it works during device outages too.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
    from lkgd_tpu.parallel import mesh as meshlib
    from lkgd_tpu.parallel.collective_audit import audit_compiled, summarize

    mesh = meshlib.make_mesh({"data": 2, "context": 4})
    # 8-chip deployment shards the frame axis 4-way: 14 frames pad to 16 (the same
    # padding discipline the smooth pipeline uses). Conservative for the projection —
    # 2 extra frames = +14% FLOPs vs the measured 14-frame step.
    B, T, H, W = 2, 16, 72, 128  # CFG-doubled full-size latents (576x1024)
    cfg = SVDUNetConfig(num_frames=T)
    unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.bfloat16)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sample = jax.ShapeDtypeStruct((B, T, H, W, cfg.in_channels), jnp.bfloat16,
                                  sharding=NamedSharding(mesh, P("data", "context")))
    ts = jax.ShapeDtypeStruct((B,), jnp.float32)
    ehs = jax.ShapeDtypeStruct((B, 1, cfg.cross_attention_dim), jnp.bfloat16)
    ids = jax.ShapeDtypeStruct((B, 3), jnp.float32)
    pshapes = jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((B, T, H, W, cfg.in_channels), jnp.bfloat16),
        jnp.zeros((B,)), jnp.zeros((B, 1, cfg.cross_attention_dim), jnp.bfloat16),
        jnp.zeros((B, 3))))
    rep = NamedSharding(mesh, P())
    pshapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), pshapes)

    t0 = time.time()
    with jax.set_mesh(mesh):
        compiled = jax.jit(
            unet.apply,
            out_shardings=NamedSharding(mesh, P("data", "context")),
        ).lower(pshapes, sample, ts, ehs, ids).compile()
    print(f"# partitioned compile {time.time()-t0:.1f}s (mesh data=2 context=4, "
          f"14f 576x1024 CFG-doubled UNet step)", file=sys.stderr)

    found = audit_compiled(compiled)
    print(summarize(found), file=sys.stderr)
    ici_bytes = sum(b for entries in found.values() for b, _ in entries)
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    # v5e roofline: 2D-torus ring collectives move result-bytes at ~2 ICI links/chip
    # x 45 GB/s/link one-way = 90 GB/s effective per chip; compute scales ~1/8 from the
    # measured single-chip step (1.04 s, BASELINE.md session 7).
    single_chip_step = 1.04 * (16 / 14)  # measured 14f step, padded to 16f
    ici_s = ici_bytes / 8 / 90e9
    step_s = single_chip_step / 8 + ici_s
    clip_s = 25 * step_s + 0.9 / 4 + 0.074  # + context-parallel VAE decode + encode
    print(json.dumps({
        "metric": "projected v5e-8 sec/clip (compile-audited, roofline)",
        "value": round(clip_s, 3), "unit": "s",
        "detail": {"ici_bytes_per_step": ici_bytes, "ici_s_per_step": round(ici_s, 4),
                   "hlo_flops_per_step": flops,
                   "collectives": {k: len(v) for k, v in found.items()}},
        "vs_baseline": round(NORTH_STAR / clip_s, 3),
    }))

    # ---- ZeRO train step over {data: 8}: the multi-chip TRAINING projection
    # (reference trains DDP/DeepSpeed; this audits what our pjit-native ZeRO step
    # moves over ICI at the measured single-chip train config, 512x512 x 8f)
    from lkgd_tpu.models.configs import LoraRouter, LoraRule
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
    from lkgd_tpu.parallel.mesh import replicated, shard_batch
    from lkgd_tpu.training.train_state import (SVDTrainConfig, init_train_state,
                                               make_optimizer, make_svd_train_step)
    from lkgd_tpu.training.trainer import make_zero_train_step

    tmesh = meshlib.make_mesh({"data": 8})
    tcfg = SVDUNetConfig(
        num_frames=8, knowledge_fusion=True, remat=True,
        lora=LoraRouter(rules=(
            LoraRule("*temporal_transformer_blocks*attn1.*", "lkgd", 4, 4.0, ()),)))
    tunet = UNetSpatioTemporalCondition(tcfg, dtype=jnp.bfloat16)
    b, t_, hh, ww = 8, 8, 64, 64  # global batch 8 = 1/chip, the measured config
    batch = {
        "latents": jnp.zeros((b, t_, hh, ww, 4), jnp.float32),
        "cond_latents": jnp.zeros((b, hh, ww, 4), jnp.float32),
        "image_embeddings": jnp.zeros((b, 1, 1024), jnp.float32),
        "domain_features": jnp.zeros((b, 1, 1024), jnp.float32),
        "flow_features": jnp.zeros((b, 1, 1024), jnp.float32),
    }
    trainable = lambda path: "lora_" in path or "knowledge_fusion" in path  # noqa: E731
    opt = make_optimizer(2e-4, trainable_predicate=trainable)
    tstep = make_svd_train_step(tunet, opt, SVDTrainConfig())
    t0 = time.time()
    with jax.set_mesh(tmesh):
        tparams = jax.eval_shape(lambda: tunet.init(
            jax.random.PRNGKey(0), batch["latents"].repeat(2, axis=-1),
            jnp.zeros((b,)), batch["image_embeddings"], jnp.ones((b, 3)),
            domain_features=batch["domain_features"],
            flow_features=batch["flow_features"]))
        rep = replicated(tmesh)
        tparams = jax.tree.map(
            lambda sh: jax.ShapeDtypeStruct(sh.shape, sh.dtype, sharding=rep), tparams)
        state_shapes = jax.eval_shape(lambda p: init_train_state(p, opt), tparams)
        from lkgd_tpu.training.trainer import zero_shardings

        zsh = zero_shardings(tmesh, state_shapes, "data")
        state_abs = jax.tree.map(
            lambda sh, sd: jax.ShapeDtypeStruct(sh.shape, sh.dtype, sharding=sd),
            state_shapes, zsh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = jax.tree.map(lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(tmesh, P("data"))), batch)
        key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
        compiled_t = jax.jit(tstep, donate_argnums=(0,),
                             out_shardings=(zsh, None)).lower(
                                 state_abs, bsh, key_abs).compile()
    print(f"# ZeRO train-step partitioned compile {time.time()-t0:.1f}s "
          f"(mesh data=8, 512x512 x 8f global batch 8)", file=sys.stderr)
    tfound = audit_compiled(compiled_t)
    print(summarize(tfound), file=sys.stderr)
    t_ici = sum(bb for entries in tfound.values() for bb, _ in entries)
    t_step = 0.393 + t_ici / 8 / 90e9  # measured single-chip step + per-chip ICI time
    print(json.dumps({
        "metric": "projected v5e-8 ZeRO train sec/step (global batch 8, compile-audited)",
        "value": round(t_step, 4), "unit": "s",
        "detail": {"ici_bytes_per_step": t_ici,
                   "collectives": {k: len(v) for k, v in tfound.items()},
                   "note": "8x the measured single-chip throughput at +"
                           f"{round((t_step/0.393 - 1) * 100, 1)}% step time"},
    }))


def bench_mesh_joint_dryrun():
    """Certify the FULL-SIZE 576x1024 joint (trans/smooth) UNet graphs on a v5e-8 mesh.

    These configs OOM a single 16 GB chip (r3_results: trans_full/smooth_full rc=1),
    so the mesh is their ONLY deployment path — this mode AOT-compiles each joint step
    against the REAL ``v5e:2x4`` TPU topology descriptor (PJRT deviceless compile: real
    fusion, real buffer assignment, Mosaic flash kernels in-graph — unlike a CPU-mesh
    compile, whose unfused temp numbers overstate HBM by 10-30x), audits every
    collective, and reads per-chip HBM from the executable's memory analysis to assert
    < 16 GB (VERDICT r3 item 4). Reference graphs: pipeline...trans.py:541-575
    (4 CFG-doubled joint rows), pipeline...smooth.py:526-594 (chunks x 4 stream rows;
    NC=4 covers the 28-49f range and shards 8 ways)."""
    import jax
    import numpy as np
    from jax.experimental import topologies

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # the local default backend is CPU (deviceless AOT) — force the flash kernels in
    # so the certified graph IS the deployment graph (see ops.attention._use_flash)
    os.environ.setdefault("LKGD_FORCE_FLASH", "1")

    from lkgd_tpu.models.configs import JointAttentionConfig, LoraRouter, LoraRule, SVDUNetConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
    from lkgd_tpu.parallel.collective_audit import audit_compiled, summarize

    topo_devs = topologies.get_topology_desc("v5e:2x4", "tpu").devices

    HBM = 16 * 1024**3
    configs = [
        # (tag, rows, frames(padded), mesh layout {data, context})
        ("trans_full_576x1024", 4, 16, {"data": 2, "context": 4}),
        ("trans_full_576x1024", 4, 16, {"data": 4, "context": 2}),
        ("smooth_full_576x1024_32f", 16, 16, {"data": 8, "context": 1}),
        ("smooth_full_576x1024_32f", 16, 16, {"data": 4, "context": 2}),
    ]
    for tag, rows, T, layout in configs:
        mesh = Mesh(np.array(topo_devs).reshape(layout["data"], layout["context"]),
                    ("data", "context"))
        mask = tuple([0, 1] * (rows // 2))
        cfg = SVDUNetConfig(
            num_frames=T,
            joint=JointAttentionConfig(post="conv", flip=True, mask=mask, spatial=True,
                                       temporal=True),
            lora=LoraRouter(rules=(
                LoraRule("*attn1n*", "yx_lora", 64, 8.0, mask),)))
        unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.bfloat16)
        H, W = 72, 128
        rep = NamedSharding(mesh, P())
        pshapes = jax.eval_shape(lambda u=unet, c=cfg, r=rows, t=T: u.init(
            jax.random.PRNGKey(0), jnp.zeros((r, t, H, W, c.in_channels), jnp.bfloat16),
            jnp.zeros((r,)), jnp.zeros((r, 1, c.cross_attention_dim), jnp.bfloat16),
            jnp.zeros((r, 3))))
        pshapes = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), pshapes)
        sample = jax.ShapeDtypeStruct((rows, T, H, W, cfg.in_channels), jnp.bfloat16,
                                      sharding=NamedSharding(mesh, P("data", "context")))
        ts = jax.ShapeDtypeStruct((rows,), jnp.float32)
        ehs = jax.ShapeDtypeStruct((rows, 1, cfg.cross_attention_dim), jnp.bfloat16)
        ids = jax.ShapeDtypeStruct((rows, 3), jnp.float32)
        t0 = time.time()
        with jax.set_mesh(mesh):
            compiled = jax.jit(
                unet.apply,
                out_shardings=NamedSharding(mesh, P("data", "context")),
            ).lower(pshapes, sample, ts, ehs, ids).compile()
        found = audit_compiled(compiled)
        # the certified graph must BE the deployment graph: count the Mosaic custom
        # calls so the artifact proves the flash kernels partitioned in (a silent
        # XLA-attention fallback via ops.attention's try/except would also compile)
        mosaic_calls = compiled.as_text().count("tpu_custom_call")
        if mosaic_calls == 0:
            raise SystemExit(
                f"joint certification {tag}: 0 Mosaic custom calls in the compiled "
                "graph — the flash kernels fell back to XLA attention, so this would "
                "certify a graph that is NOT the deployment graph")
        ma = compiled.memory_analysis()
        peak = int(getattr(ma, "peak_memory_in_bytes", 0))
        args_b = int(getattr(ma, "argument_size_in_bytes", 0))
        temp_b = int(getattr(ma, "temp_size_in_bytes", 0))
        out_b = int(getattr(ma, "output_size_in_bytes", 0))
        ici = sum(b for entries in found.values() for b, _ in entries)
        total = args_b + temp_b + out_b
        print(f"# {tag} mesh={layout}: compile {time.time()-t0:.1f}s", file=sys.stderr)
        print(summarize(found), file=sys.stderr)
        print(json.dumps({
            "metric": f"joint mesh certification: {tag}",
            "mesh": layout,
            "per_chip_bytes": {"arguments": args_b, "temp": temp_b, "output": out_b,
                               "peak": peak, "total_args_temp_out": total},
            "per_chip_gb": round(total / 1024**3, 2),
            "fits_16gb": bool(total < HBM),
            "ici_bytes_per_step": ici,
            "ici_ms_per_step": round(ici / 8 / 90e9 * 1e3, 2),
            "collectives": {k: len(v) for k, v in found.items()},
            "mosaic_calls": mosaic_calls,
        }))


def bench_mesh_hybrid_dryrun():
    """Certify the multi-slice (DCN) training deployment against a REAL 2-slice
    v5e topology (VERDICT r4 item 4; SURVEY §2.9 "ICI within a slice, DCN across
    slices"; reference analog: multi-node DeepSpeed, accelerate_config.yaml
    num_machines + zero2.yaml). AOT-compiles the measured LKGD train step (512x512 x
    8f, quaternion+LoRA trainables, ZeRO moments sharded over the intra-slice 'data'
    axis) on a {slice: 2, data: 8} mesh built from
    ``get_topology_desc("v5e:2x4", num_slices=2)`` — 16 real-topology devices with
    hardware slice_index — then splits every compiled collective by substrate
    (collective_audit.split_dcn_ici). The certification claim: ALL bulk traffic
    (ZeRO gather/scatter of moments) stays on ICI; only the trainable-gradient
    all-reduce crosses the DCN."""
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lkgd_tpu.models.configs import LoraRouter, LoraRule, SVDUNetConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
    from lkgd_tpu.parallel import mesh as meshlib
    from lkgd_tpu.parallel.collective_audit import split_dcn_ici, summarize
    from lkgd_tpu.training.train_state import (SVDTrainConfig, init_train_state,
                                               make_optimizer, make_svd_train_step)
    from lkgd_tpu.training.trainer import zero_shardings

    topo_devs = topologies.get_topology_desc("v5e:2x4", "tpu", num_slices=2).devices
    mesh = meshlib.make_mesh({"slice": 2, "data": 8}, topo_devs)
    smap = meshlib.slice_of_device_map(mesh)
    assert len(set(smap.values())) == 2, smap

    tcfg = SVDUNetConfig(
        num_frames=8, knowledge_fusion=True, remat=True,
        lora=LoraRouter(rules=(
            LoraRule("*temporal_transformer_blocks*attn1.*", "lkgd", 4, 4.0, ()),)))
    unet = UNetSpatioTemporalCondition(tcfg, dtype=jnp.bfloat16)
    b, t_, hh, ww = 16, 8, 64, 64  # global batch 16 = 1/chip over 2 slices x 8
    batch_shapes = {
        "latents": (b, t_, hh, ww, 4), "cond_latents": (b, hh, ww, 4),
        "image_embeddings": (b, 1, 1024), "domain_features": (b, 1, 1024),
        "flow_features": (b, 1, 1024)}
    trainable = lambda path: "lora_" in path or "knowledge_fusion" in path  # noqa: E731
    opt = make_optimizer(2e-4, trainable_predicate=trainable)
    tstep = make_svd_train_step(unet, opt, SVDTrainConfig())
    rep = NamedSharding(mesh, P())
    t0 = time.time()
    with jax.set_mesh(mesh):
        pshapes = jax.eval_shape(lambda: unet.init(
            jax.random.PRNGKey(0), jnp.zeros((b, t_, hh, ww, 8), jnp.float32),
            jnp.zeros((b,)), jnp.zeros((b, 1, 1024)), jnp.ones((b, 3)),
            domain_features=jnp.zeros((b, 1, 1000)),
            flow_features=jnp.zeros((b, 1, 1000))))
        pshapes = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), pshapes)
        state_shapes = jax.eval_shape(lambda p: init_train_state(p, opt), pshapes)
        zsh = zero_shardings(mesh, state_shapes, "data")  # moments INTRA-slice
        state_abs = jax.tree.map(
            lambda sh, sd: jax.ShapeDtypeStruct(sh.shape, sh.dtype, sharding=sd),
            state_shapes, zsh)
        bsh = {k: jax.ShapeDtypeStruct(s, jnp.float32,
                                       sharding=NamedSharding(mesh, P(("slice", "data"))))
               for k, s in batch_shapes.items()}
        key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
        compiled = jax.jit(tstep, donate_argnums=(0,),
                           out_shardings=(zsh, None)).lower(
                               state_abs, bsh, key_abs).compile()
    print(f"# hybrid 2-slice ZeRO compile {time.time()-t0:.1f}s "
          f"(mesh slice=2 data=8, 16 topology devices)", file=sys.stderr)
    split = split_dcn_ici(compiled.as_text(), smap)
    dcn_b = sum(bb for v in split["dcn"].values() for bb, _ in v)
    ici_b = sum(bb for v in split["ici"].values() for bb, _ in v)
    print("== DCN:", file=sys.stderr)
    print(summarize(split["dcn"]), file=sys.stderr)
    print("== ICI:", file=sys.stderr)
    print(summarize(split["ici"]), file=sys.stderr)
    # DCN rides ~25 GB/s/host vs ICI 90 GB/s/chip: the deployment holds iff DCN bytes
    # stay a small multiple of the trainable gradient bytes (LoRA+fusion ~ MBs)
    print(json.dumps({
        "metric": "hybrid 2-slice ZeRO certification (v5e:2x4 x2, slice=2 data=8)",
        "dcn_bytes_per_step": dcn_b,
        "ici_bytes_per_step": ici_b,
        "dcn_collectives": {k: len(v) for k, v in split["dcn"].items()},
        "ici_collectives": {k: len(v) for k, v in split["ici"].items()},
        "dcn_ms_per_step_at_25GBs": round(dcn_b / 2 / 25e9 * 1e3, 2),
    }), flush=True)


def bench_mesh_cogvideox_dryrun():
    """Certify the FULL-SIZE CogVideoX-5B I2V DiT step (49f x 480x720 latents, CFG-
    doubled, S=17776) on a v5e-8 mesh — the xDiT serving parity story at scale
    (reference `CogVideo-main/tools/parallel_inference/parallel_inference_xdit.py:14-51`
    runs ulysses_degree x ring_degree over 8 GPUs; the 2B/5B checkpoints are ~11 GB bf16
    so single-chip v5e serving is memory-bound). AOT-compiles against the real
    ``v5e:2x4`` topology per layout, audits collectives, asserts Mosaic flash in-graph,
    and reads per-chip HBM from the executable memory analysis:

      * tp4_data2:      megatron TP over 'model' (parallel/tp.cogvideox_tp_specs),
                        CFG batch over 'data'
      * ulysses_sp4:    sequence-parallel video tokens over 'context'
                        (models/cogvideox joint_sp_attention), CFG over 'data'
      * fsdp4_data2:    weight-sharded (ZeRO-3 style) serving over 'model'
    """
    import dataclasses

    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    os.environ.setdefault("LKGD_FORCE_FLASH", "1")

    from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D
    from lkgd_tpu.parallel import tp as tplib
    from lkgd_tpu.parallel.collective_audit import audit_compiled, summarize

    topo_devs = topologies.get_topology_desc("v5e:2x4", "tpu").devices
    HBM = 16 * 1024**3
    b, t, h, w = 2, 13, 60, 90  # CFG-doubled; 49f x 480x720 latents

    configs = [
        # (tag, layout, weight mode, sequence_parallel, latent frames)
        # ulysses shards the video token axis over 'context': 13 latent frames x 1350
        # tokens/frame is not 4-divisible, so the SP=4 serving config pads the clip to
        # 16 latent frames (the same pad-then-trim discipline as the SVD mesh path;
        # xDiT pads identically) — conservative +23% FLOPs in this cert
        # pure-SP (weights replicated) is NOT v5e-deployable for the 5B model:
        # measured r5, XLA buffer assignment needs 21.67 GB (11.2 GB bf16 weights per
        # chip + sharded activations) vs 15.75 GB hbm — on 16 GB chips ulysses must
        # combine with FSDP weight sharding over the same axis (xDiT's A100s simply
        # have the 40-80 GB to replicate into)
        ("tp4_data2", {"data": 2, "model": 4}, "tp", "none", t),
        ("ulysses_sp4_fsdp4_pad16f", {"data": 2, "context": 4}, "fsdp:context",
         "ulysses", 16),
        ("fsdp4_data2", {"data": 2, "model": 4}, "fsdp:model", "none", t),
    ]
    for tag, layout, weight_mode, seq_par, t in configs:
        mesh = Mesh(np.array(topo_devs).reshape(tuple(layout.values())),
                    tuple(layout.keys()))
        cfg = dataclasses.replace(CogVideoXConfig.cogvideox_5b_i2v(),
                                  sequence_parallel=seq_par)
        model = CogVideoXTransformer3D(cfg, dtype=jnp.bfloat16)
        sample_axes = ["data", None, None, None, None]
        if "context" in layout:
            sample_axes[1] = "context"
        sample = jax.ShapeDtypeStruct((b, t, h, w, cfg.in_channels), jnp.bfloat16,
                                      sharding=NamedSharding(mesh, P(*sample_axes)))
        text = jax.ShapeDtypeStruct((b, cfg.max_text_seq_length, 4096), jnp.bfloat16,
                                    sharding=NamedSharding(mesh, P("data")))
        ts = jax.ShapeDtypeStruct((b,), jnp.int32,
                                  sharding=NamedSharding(mesh, P()))
        key0 = jax.random.PRNGKey(0)  # concrete; MUST be made outside the deviceless
        # topology-mesh context (eager dispatch there has no local devices)
        with jax.set_mesh(mesh):  # SP configs emit PartitionSpec sharding constraints
            shapes = jax.eval_shape(
                model.init, key0,
                jax.ShapeDtypeStruct((b, t, h, w, cfg.in_channels), jnp.bfloat16),
                jax.ShapeDtypeStruct((b, cfg.max_text_seq_length, 4096), jnp.bfloat16),
                jax.ShapeDtypeStruct((b,), jnp.int32))
        if weight_mode == "tp":
            specs = tplib.cogvideox_tp_specs(shapes, axis="model")
        elif weight_mode.startswith("fsdp:"):
            ax = weight_mode.split(":", 1)[1]
            specs = tplib.fsdp_specs(shapes, axis=ax, axis_size=layout[ax])
        else:
            specs = jax.tree.map(lambda _: P(), shapes)
        pshapes = jax.tree.map(
            lambda s, sp: jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=NamedSharding(mesh, sp)), shapes, specs)
        t0 = time.time()
        with jax.set_mesh(mesh):
            compiled = jax.jit(
                model.apply,
                out_shardings=NamedSharding(mesh, P(*sample_axes)),
            ).lower(pshapes, sample, text, ts).compile()
        found = audit_compiled(compiled)
        mosaic_calls = compiled.as_text().count("tpu_custom_call")
        if mosaic_calls == 0:
            raise SystemExit(f"cogvideox certification {tag}: 0 Mosaic calls — "
                             "flash fell back to XLA; not the deployment graph")
        ma = compiled.memory_analysis()
        args_b = int(getattr(ma, "argument_size_in_bytes", 0))
        temp_b = int(getattr(ma, "temp_size_in_bytes", 0))
        out_b = int(getattr(ma, "output_size_in_bytes", 0))
        total = args_b + temp_b + out_b
        ici = sum(bb for entries in found.values() for bb, _ in entries)
        print(f"# {tag} mesh={layout}: compile {time.time()-t0:.1f}s", file=sys.stderr)
        print(summarize(found), file=sys.stderr)
        print(json.dumps({
            "metric": f"cogvideox-5b mesh certification: {tag}",
            "mesh": layout,
            "per_chip_gb": round(total / 1024**3, 2),
            "per_chip_bytes": {"arguments": args_b, "temp": temp_b, "output": out_b},
            "fits_16gb": bool(total < HBM),
            "ici_bytes_per_step": ici,
            "ici_ms_per_step": round(ici / 8 / 90e9 * 1e3, 2),
            "collectives": {k: len(v) for k, v in found.items()},
            "mosaic_calls": mosaic_calls,
        }), flush=True)


def bench_cogvideox_clip(reps):
    """The FULL CogVideoX-5B I2V clip: 50-step DDIM/dynamic-CFG denoise (one jitted
    scan) + conv-cached chunked VAE decode — sec/clip, the xDiT-comparable number
    (reference cli_demo.py runs 50 steps at 49f x 480x720)."""
    import dataclasses

    from lkgd_tpu.models.cogvideox import CogVideoXConfig
    from lkgd_tpu.models.vae_cogvideox import (AutoencoderKLCogVideoX,
                                               CogVideoXVAEConfig, chunked_decode)
    from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                                  CogVideoXPipelineConfig)

    small = bool(os.environ.get("LKGD_BENCH_SMALL"))
    steps = int(os.environ.get("LKGD_BENCH_COG_STEPS", "50"))
    if small:
        tcfg = CogVideoXConfig.tiny()
        pcfg = CogVideoXPipelineConfig(height=64, width=64, num_frames=9,
                                       num_inference_steps=2)
        vcfg = CogVideoXVAEConfig.tiny()
    else:
        tcfg = CogVideoXConfig.cogvideox_5b_i2v()
        pcfg = CogVideoXPipelineConfig(num_inference_steps=steps)
        vcfg = CogVideoXVAEConfig()
    pipe = CogVideoXImageToVideoPipeline(pcfg, tcfg, dtype=jnp.bfloat16)
    params = _synthetic_bf16_params(pipe.init_params, jax.random.PRNGKey(0))
    # The 5B DiT leaves <1 GB HBM headroom: co-resident VAE decode OOM-crashes the
    # 16 GB chip (measured r5 — tiled 30x45/chunk-2 decode AND merely materializing
    # the VAE params both killed the worker). Single-chip metric = the 50-step
    # denoise scan; the decode is measured separately (LKGD_BENCH_PIPELINE=vae) and
    # the clip total is their sum. LKGD_BENCH_COG_DECODE=1 forces co-residency.
    with_decode = small or bool(os.environ.get("LKGD_BENCH_COG_DECODE"))
    vae = vparams = None
    if with_decode:
        vae = AutoencoderKLCogVideoX(vcfg, dtype=jnp.bfloat16)
        vshapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, 64, 64, 3)))
        vleaves, vtree = jax.tree.flatten(vshapes)
        vparams = jax.tree.unflatten(vtree, [
            jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(7), i), l.shape,
                              jnp.bfloat16) * 0.02 for i, l in enumerate(vleaves)])
    jax.block_until_ready(params)

    pe = jax.random.normal(jax.random.PRNGKey(1),
                           (1, tcfg.max_text_seq_length, tcfg.text_embed_dim),
                           jnp.bfloat16) * 0.02
    img_lat = jax.random.normal(jax.random.PRNGKey(2),
                                (1, pcfg.latent_height, pcfg.latent_width,
                                 tcfg.out_channels), jnp.bfloat16) * 0.5
    rng = jax.random.PRNGKey(3)

    # dispatch the denoise in 5-step segments: the axon relay kills single device
    # executions past ~1 min (measured r5: 2-step scan 14 s OK, 25-step scan crashes
    # the worker), and 5 x 7.2 s stays under it. One compiled program serves all
    # segments (step indices travel as data). 0 = the one-scan path.
    seg = int(os.environ.get("LKGD_BENCH_COG_SEGMENT", "0" if small else "5"))

    def run():
        if seg:
            latents = pipe.generate_segmented(params, pe, img_lat, rng=rng,
                                              segment_steps=seg)
        else:
            latents = pipe._generate(params, pe, jnp.zeros_like(pe), img_lat, rng,
                                     None, None)
        if not with_decode:
            return latents
        frames = chunked_decode(vae, vparams,
                                latents.astype(jnp.bfloat16) / vcfg.scaling_factor,
                                chunk_latent_frames=2)
        return frames
    label = (f"sec/clip cogvideox-5b i2v ({pcfg.num_frames}f x {pcfg.width}x"
             f"{pcfg.height}, {pcfg.num_inference_steps} steps"
             + (" + chunked decode)" if with_decode else ", denoise scan; decode "
                "measured separately in vae mode)"))
    if small:
        label = "sec/clip cogvideox (smoke config)"
    return label, _time(run, reps, label)


def _require_device(timeout_s: float = 180.0) -> None:
    """Fail fast (rc=1) if the backend hangs or is CPU: a dead device tunnel would
    otherwise hang jax.devices() indefinitely, and a silent CPU fallback would report a
    meaningless number as the headline metric."""
    import threading

    result = []
    t = threading.Thread(target=lambda: result.append(jax.devices()), daemon=True)
    t.start()
    t.join(timeout_s)
    if not result:
        raise SystemExit(f"bench: device backend did not initialize within {timeout_s:.0f}s "
                         "(device tunnel down?) — refusing to benchmark")
    if result[0][0].platform == "cpu" and not os.environ.get("LKGD_BENCH_ALLOW_CPU"):
        raise SystemExit("bench: default backend is CPU — the headline metric is a device "
                         "number; set LKGD_BENCH_ALLOW_CPU=1 to force")


def main():
    from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    if os.environ.get("LKGD_BENCH_MESH") == "dryrun":
        bench_mesh_dryrun()
        return
    if os.environ.get("LKGD_BENCH_MESH") == "joint":
        bench_mesh_joint_dryrun()
        return
    if os.environ.get("LKGD_BENCH_MESH") == "cogvideox":
        bench_mesh_cogvideox_dryrun()
        return
    if os.environ.get("LKGD_BENCH_MESH") == "hybrid":
        bench_mesh_hybrid_dryrun()
        return
    _require_device()
    small = bool(os.environ.get("LKGD_BENCH_SMALL"))
    reps = int(os.environ.get("LKGD_BENCH_REPS", "3"))
    which = os.environ.get("LKGD_BENCH_PIPELINE", "base")

    if which == "base":
        label, value = bench_base(small, reps)
    elif which == "trans":
        label, value = bench_trans(reps)
    elif which == "controlnet":
        label, value = bench_controlnet(reps)
    elif which == "smooth":
        label, value = bench_smooth(reps)
    elif which == "cogvideox":
        label, value = bench_cogvideox(reps)
    elif which == "cogvideox_clip":
        label, value = bench_cogvideox_clip(reps)
    elif which == "train":
        label, value = bench_train(reps)
    elif which == "vae":
        label, value = bench_vae(reps)
    else:
        raise SystemExit(f"unknown LKGD_BENCH_PIPELINE={which!r}")

    # the official line was already emitted by _time after each rep (best-so-far);
    # the LAST line on stdout is the final min-of-reps value
    del label, value


if __name__ == "__main__":
    main()
