"""Per-op profile of one full-size CogVideoX-5B DiT step (CFG-doubled, 49f x 480x720).

Measured 11.455 s/step (r3 queue2) ~= 42 TF/s — but the component roofline is ~5.7 s
(attention core 326 TFLOP at the flash kernel's 77 TF/s + ~150 TFLOP of dense matmuls
at ~100 TF/s). This locates the 2x gap (flash engagement? rope/qk-norm concat copies?
adaLN elementwise passes?)."""

import sys
import time

sys.path.insert(0, "/root/repo")
from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D

sys.path.insert(0, "/root/repo/experiments")
from profile_unet_step import parse_xplane  # noqa: E402


def main():
    cfg = CogVideoXConfig.cogvideox_5b_i2v()
    model = CogVideoXTransformer3D(cfg, dtype=jnp.bfloat16)
    b, t, h, w = 2, 13, 60, 90
    sample = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, cfg.in_channels),
                               jnp.bfloat16)
    text = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.max_text_seq_length, 4096),
                             jnp.bfloat16) * 0.02
    timestep = jnp.full((b,), 500, jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, text, timestep)
    leaves, treedef = jax.tree.flatten(shapes)
    params = jax.tree.unflatten(treedef, [
        jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(0), i), l.shape,
                          jnp.bfloat16) * 0.02 for i, l in enumerate(leaves)])
    jax.block_until_ready(params)

    fwd = jax.jit(model.apply)
    t0 = time.time()
    out = fwd(params, sample, text, timestep)
    _ = float(jnp.asarray(out).ravel()[0])
    print(f"compile+run {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _i in range(2):
        t0 = time.time()
        out = fwd(params, sample, text, timestep)
        _ = float(jnp.asarray(out).ravel()[0])
        times.append(time.time() - t0)
    print(f"step times: {[round(x, 3) for x in times]}")

    import os

    logdir = "/tmp/lkgd_cog_profile"
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        out = fwd(params, sample, text, timestep)
        _ = float(jnp.asarray(out).ravel()[0])
    parse_xplane(logdir)


if __name__ == "__main__":
    main()
