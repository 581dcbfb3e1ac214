"""Floor-probe: the UNet resblock 3x3 convs, per shape class (VERDICT r4 item 2).

The r3/r4 profiles put ~192 ms/step in conv mega-fusions at "70-86% MFU on the big
3x3s" while the aggregated conv/norm/FFN bucket averages ~45% — and the VAE decoder's
convs prove 59% end-to-end is reachable. This measures every distinct resblock conv
shape of the full-size (576x1024, CFG-doubled, 14f) UNet step in isolation:

  a. clean conv:    jax.lax NHWC conv_general_dilated, fresh bf16 inputs
  b. gn+silu+conv:  the in-network producer chain (GroupNorm one-pass + silu epilogue)
  c. im2col matmul: patches (M, 9*Cin) x (9*Cin, Cout) single dot
  d. 9-shift dots:  3x3 conv as 9 shifted (M, Cin)x(Cin, Cout) dots accumulated

plus the temporal (3,1) convs at their (B, T, HW, C) shapes. If (c)/(d) beat (a) at any
shape class, that shape's conv emitter is not at the toolchain ceiling and the resblock
conv can be re-expressed; if (a) ~= best everywhere, the 45% bucket average is epilogue/
layout context, not the conv emitter, and the documented ceiling stands.

Timing: REPS iterations inside one jitted fori_loop with a 1-element data dependency
(the axon roundtrip is ~33 ms; see matmul_microbench.py methodology).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

REPS = 30
DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def timeit_loop(op, *args):
    @jax.jit
    def run(*args):
        def body(_, carry):
            x, acc = carry
            s = op(x, *carry_rest)
            x = x.at[(0,) * x.ndim].add(s.astype(x.dtype) * 1e-30)
            return x, acc + s

        carry_rest = args[1:]
        (_, acc) = jax.lax.fori_loop(0, REPS, body, (args[0], jnp.float32(0)))
        return acc

    _ = float(run(*args))
    times = []
    for _i in range(3):
        t0 = time.time()
        _ = float(run(*args))
        times.append((time.time() - t0) / REPS)
    return float(np.median(times))


def _consume(y):
    # FULL-tensor reduction: a single-element consume lets XLA strength-reduce the conv
    # to one output position (first run read "1768 TF/s" > the 197 peak — invalid).
    # The sum fuses into the conv epilogue and costs the same in every variant.
    return jnp.sum(y, dtype=jnp.float32)


def conv_clean(x, w):
    y = jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=DN,
                                     preferred_element_type=jnp.bfloat16)
    return _consume(y)


def gn_silu_conv(x, w, gamma, beta):
    # one-pass row-axis GroupNorm (the production formulation, models/layers.GroupNorm)
    b, h, wd, c = x.shape
    g = 32
    xg = x.reshape(b, h * wd, g, c // g).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True) - jnp.square(mean)
    xn = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn.reshape(b, h, wd, c) * gamma + beta).astype(x.dtype)
    y = jax.lax.conv_general_dilated(jax.nn.silu(xn), w, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=DN,
                                     preferred_element_type=jnp.bfloat16)
    return _consume(y)


def im2col_matmul(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN)
    y = jnp.einsum("bhwk,ko->bhwo", patches, w.reshape(-1, cout),
                   preferred_element_type=jnp.bfloat16)
    return _consume(y)


def shift9_dots(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, wd, cout), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, di, dj, 0), (b, h, wd, cin))
            acc = acc + jnp.einsum("bhwc,co->bhwo", xs, w[di, dj],
                                   preferred_element_type=jnp.float32)
    return _consume(acc)


def conv_t31(x, w):
    # temporal (3,1) conv over (B, T, HW, C) — TemporalResnetBlock formulation
    y = jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (0, 0)),
                                     dimension_numbers=DN,
                                     preferred_element_type=jnp.bfloat16)
    return _consume(y)


def main():
    rows = 28  # CFG-doubled 2 x 14 frames
    spatial_shapes = [
        # (H, W, Cin, Cout) — every distinct resblock conv of the 576x1024 step
        (72, 128, 320, 320),
        (72, 128, 640, 320),    # up-path after skip concat
        (72, 128, 960, 320),
        (36, 64, 320, 640),
        (36, 64, 640, 640),
        (36, 64, 960, 640),
        (36, 64, 1280, 640),
        (18, 32, 640, 1280),
        (18, 32, 1280, 1280),
        (18, 32, 1920, 1280),
        (9, 16, 1280, 1280),
        (9, 16, 1920, 1280),
        (9, 16, 2560, 1280),
    ]
    temporal_shapes = [
        # (T=14, HW, C) at batch 2 (CFG rows) — the (3,1,1) temporal resblock convs
        (14, 9216, 320),
        (14, 2304, 640),
        (14, 576, 1280),
        (14, 144, 1280),
    ]
    key = jax.random.PRNGKey(0)
    results = []
    for h, wd, cin, cout in spatial_shapes:
        x = jax.random.normal(key, (rows, h, wd, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.02
        gamma = jnp.ones((cin,), jnp.float32)
        beta = jnp.zeros((cin,), jnp.float32)
        flops = 2 * rows * h * wd * 9 * cin * cout
        r = {"shape": f"{rows}x{h}x{wd} {cin}->{cout}", "gflop": round(flops / 1e9, 1)}
        for name, fn, args in [
            ("clean", conv_clean, (x, w)),
            ("gn_silu", gn_silu_conv, (x, w, gamma, beta)),
            ("im2col", im2col_matmul, (x, w)),
            ("shift9", shift9_dots, (x, w)),
        ]:
            try:
                s = timeit_loop(fn, *args)
                r[name] = {"ms": round(s * 1e3, 3), "tf_s": round(flops / s / 1e12, 1)}
            except Exception as e:  # OOM etc.
                r[name] = {"error": str(e)[:80]}
        print(json.dumps(r), flush=True)
        results.append(r)
    for t, hw, c in temporal_shapes:
        x = jax.random.normal(key, (2, t, hw, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 1, c, c), jnp.bfloat16) * 0.02
        flops = 2 * 2 * t * hw * 3 * c * c
        s = timeit_loop(conv_t31, x, w)
        r = {"shape": f"t31 2x{t}x{hw} {c}->{c}", "gflop": round(flops / 1e9, 1),
             "clean": {"ms": round(s * 1e3, 3), "tf_s": round(flops / s / 1e12, 1)}}
        print(json.dumps(r), flush=True)
        results.append(r)


if __name__ == "__main__":
    main()
