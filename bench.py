"""Headline benchmark: seconds per generated clip (14 frames, 576x1024, 25 Euler steps).

Runs the full jitted img2vid pipeline (CLIP encode -> VAE encode -> 25 CFG-doubled UNet
steps -> chunked temporal VAE decode) on the default device and prints ONE JSON line:
  {"metric": "sec/clip (14f x 576x1024, 25 steps)", "value": ..., "unit": "s",
   "vs_baseline": ...}
vs_baseline = (10 s north-star target from BASELINE.json) / measured — >1 beats the target.

Env overrides: LKGD_BENCH_SMALL=1 for a tiny smoke config; LKGD_BENCH_REPS=N.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    small = bool(os.environ.get("LKGD_BENCH_SMALL"))
    reps = int(os.environ.get("LKGD_BENCH_REPS", "3"))

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
            config=SVDPipelineConfig(height=576, width=1024, num_frames=14,
                                     num_inference_steps=25, decode_chunk_size=14),
            unet_config=SVDUNetConfig(num_frames=14),
            dtype=jnp.bfloat16,
        )
        label = "sec/clip (14f x 576x1024, 25 steps)"

    t0 = time.time()
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    # deployment weight format: bf16 (fp32 params would hold ~7 GB of HBM and force
    # small decode chunks)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    jax.block_until_ready(params)
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    img = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, pipe.config.height, pipe.config.width, 3)),
        jnp.float32)
    rng = jax.random.PRNGKey(1)

    t0 = time.time()
    out = pipe.generate(params, img, rng)
    jax.block_until_ready(out)
    print(f"# compile+first run {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(reps):
        t0 = time.time()
        out = pipe.generate(params, img, rng)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    value = float(min(times))
    print(f"# times: {[round(t, 3) for t in times]}", file=sys.stderr)

    print(json.dumps({
        "metric": label,
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / value, 3),
    }))


if __name__ == "__main__":
    main()
