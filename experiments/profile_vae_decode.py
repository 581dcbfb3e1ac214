"""Per-op profile of the SVD temporal VAE whole-clip decode (14f x 576x1024, bf16).

0.85 s measured on-chip; decoder FLOPs are a few TFLOP and the big feature maps are
~2 GB/tensor, so the run should be HBM-bound at ~0.3-0.4 s — this locates where the
rest goes (fusion breaks, fp32 upcasts, copies)."""

import sys
import time

sys.path.insert(0, "/root/repo")
from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder, TemporalVAEConfig

sys.path.insert(0, "/root/repo/experiments")
from profile_unet_step import parse_xplane  # noqa: E402


def main():
    vae = AutoencoderKLTemporalDecoder(TemporalVAEConfig(), dtype=jnp.bfloat16)
    params = jax.jit(lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                                      num_frames=1))()
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    t, zh, zw = 14, 72, 128
    z = jax.random.normal(jax.random.PRNGKey(1), (t, zh, zw, 4), jnp.bfloat16)
    dec = jax.jit(lambda p, zz: vae.apply(p, zz, t,
                                          method=AutoencoderKLTemporalDecoder.decode))
    t0 = time.time()
    out = dec(params, z)
    _ = float(jnp.asarray(out).ravel()[0])
    print(f"compile+run {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _i in range(3):
        t0 = time.time()
        out = dec(params, z)
        _ = float(jnp.asarray(out).ravel()[0])
        times.append(time.time() - t0)
    print(f"decode times: {[round(x, 4) for x in times]}")

    import os

    logdir = "/tmp/lkgd_vae_profile"
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        out = dec(params, z)
        _ = float(jnp.asarray(out).ravel()[0])
    parse_xplane(logdir)


if __name__ == "__main__":
    main()
