"""Per-HLO-op profile of one CFG-doubled full-size ControlNet-SDV denoise step.

VERDICT r3 item 5: controlnet-sdv measured 36.25 s/clip vs ~30 s "expected at +30%
FLOPs" — but no profile existed. This harness compiles exactly the per-step graph the
pipeline scans (`pipelines/svd_controlnet.py step_fn`: controlnet branch -> scaled
residuals -> UNet with additional residuals), times it against the base UNet step on
the same process, and aggregates an xplane trace by fusion category so the delta can
be attributed (controlnet encoder convs / extra attention / cond embedder re-run per
step). Reference: `models/controlnet_sdv.py` analog of
/root/reference/models/controlnet_sdv.py:441-578.

Usage: python experiments/profile_controlnet_step.py [--reps 3] [--size 1024x576]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

from experiments.profile_unet_step import parse_xplane  # noqa: E402


def build(width: int, height: int):
    from lkgd_tpu.models.configs import SVDUNetConfig
    from lkgd_tpu.models.controlnet_svd import ControlNetSDV, ControlNetSDVConfig
    from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition

    cfg = SVDUNetConfig(num_frames=14)
    unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.bfloat16)
    cnet = ControlNetSDV(ControlNetSDVConfig(unet=cfg), dtype=jnp.bfloat16)
    B, T, H, W = 2, 14, height // 8, width // 8
    sample = jnp.zeros((B, T, H, W, cfg.in_channels), jnp.bfloat16)
    ts = jnp.full((B,), 0.25 * jnp.log(7.0))
    ehs = jnp.zeros((B, 1, cfg.cross_attention_dim), jnp.bfloat16)
    ids = jnp.asarray([[6.0, 127.0, 0.02]] * B, jnp.float32)
    control = jnp.zeros((B, T, height, width, 3), jnp.bfloat16)

    uparams = jax.jit(lambda: unet.init(jax.random.PRNGKey(0), sample, ts, ehs, ids))()
    uparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16), uparams)
    cparams = jax.jit(lambda: cnet.init(jax.random.PRNGKey(1), sample, ts, ehs, ids,
                                        controlnet_cond=control))()
    cparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16), cparams)

    def ctrl_step(up, cp, s, ctl):
        down_res, mid_res = cnet.apply(cp, s, ts, ehs, ids, controlnet_cond=ctl,
                                       conditioning_scale=1.0)
        return unet.apply(up, s, ts, ehs, ids,
                          down_block_additional_residuals=down_res,
                          mid_block_additional_residual=mid_res)

    base_step = jax.jit(lambda up, s: unet.apply(up, s, ts, ehs, ids))
    return (jax.jit(ctrl_step), base_step, uparams, cparams, sample, control)


def timeit(fn, reps, label):
    t0 = time.time()
    jax.block_until_ready(fn())
    print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        times.append(time.time() - t0)
    best = min(times)
    print(f"{label}: {[round(t, 4) for t in times]} (best {best*1e3:.1f} ms)")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--size", default="1024x576")
    ap.add_argument("--logdir", default="/tmp/lkgd_profile_ctrl")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    ctrl_step, base_step, up, cp, sample, control = build(w, h)
    t_base = timeit(lambda: base_step(up, sample), args.reps, "base unet step")
    t_ctrl = timeit(lambda: ctrl_step(up, cp, sample, control), args.reps,
                    "controlnet+unet step")
    # analytic FLOP ratio from the compiled executables' cost analyses
    try:
        fb = base_step.lower(up, sample).compile().cost_analysis()["flops"]
        fc = ctrl_step.lower(up, cp, sample, control).compile().cost_analysis()["flops"]
        print(f"flops: base {fb/1e12:.2f} TF, ctrl {fc/1e12:.2f} TF "
              f"(ratio {fc/fb:.3f})")
    except Exception as e:  # pragma: no cover
        print("cost_analysis unavailable:", e)
    print(f"step ratio: {t_ctrl/t_base:.3f} (measured), "
          f"delta {1e3*(t_ctrl-t_base):.1f} ms/step -> {25*(t_ctrl-t_base):.2f} s/clip")

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        jax.block_until_ready(ctrl_step(up, cp, sample, control))
    parse_xplane(args.logdir)


if __name__ == "__main__":
    main()
