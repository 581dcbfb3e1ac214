"""Flash bound-softmax kernel: harvestable-lever A/B at the dominant UNet shape.

r3 profile: flash = 195 ms/step (the largest single bucket) at ~77.6 TF/s for the
bound kernel. Structural context: D=64 fills only half the 128-deep MXU contraction,
so the matmul ceiling is ~98 TF/s, not 197 — the kernel already runs at ~79% of that.
VERDICT r3 asks for a measured accept/reject on the remaining in-kernel levers:

  base        the production bound kernel (pallas_call only, no wrapper cond)
  wrapper     the full _flash_bhsd path (adds _bound_t + min-reduce + cond guard)
  prescale    q pre-multiplied by scale*log2e OUTSIDE the kernel (O(S*D) once) so the
              per-element epilogue drops its multiply: s = dot(q*, k) + t
  bf16exp     exp2 evaluated in bf16 (packed VPU lanes if Mosaic supports it), row sum
              accumulated in f32; saves the separate f32->bf16 cast of p before PV
  pre+bf16    both
  noexp       exp2 replaced by identity — the MXU+bookkeeping floor (UNSAFE, floor only)
  bk1536      (768, 1536) blocks — fewer k-loop boundaries per row, same VMEM budget
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lkgd_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from lkgd_tpu.ops.flash_attention import _bound_t, _flash_bhsd  # noqa: E402

REPS = 8
_LOG2E = 1.4426950408889634


def _variant_kernel(q_ref, t_ref, k_ref, v_ref, o_ref, l_scratch, acc_scratch, *,
                    scale, n_k_blocks, mode):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    t = t_ref[0, 0, :][:, None]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if "prescale" not in mode:
        s = s * (scale * _LOG2E)
    s = s + t

    if mode.endswith("noexp"):
        p = s
        pv = p.astype(v.dtype)
    elif "bf16exp" in mode:
        p = jnp.exp2(s.astype(jnp.bfloat16))
        pv = p
    else:
        p = jnp.exp2(s)
        pv = p.astype(v.dtype)
    l_scratch[...] = l_scratch[...] + jnp.broadcast_to(
        jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True), l_scratch.shape)
    acc_scratch[...] = acc_scratch[...] + jax.lax.dot_general(
        pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == n_k_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[...] / l_scratch[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "mode"))
def run_variant(q, k, v, bq, bk, mode):
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    scale = d**-0.5
    t = _bound_t(q, k, scale)
    if "prescale" in mode:
        q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    n_k = s_k // bk
    kernel = functools.partial(_variant_kernel, scale=scale, n_k_blocks=n_k, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(bh, s_q // bq, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, t, k, v)


def timeit(fn, *args):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    times = []
    for _i in range(3):
        t0 = time.time()
        for _j in range(REPS):
            out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        times.append((time.time() - t0) / REPS)
    return sorted(times)[1]


def main():
    rng = np.random.default_rng(0)
    bh, s, d = 140, 9216, 64
    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.bfloat16)
    flops = 4 * s * s * d * bh

    ref = np.asarray(run_variant(q, k, v, 1024, 1024, "base"), np.float32)
    t = timeit(lambda a, b, c: _flash_bhsd(a, b, c, 1024, 1024), q, k, v)
    print(f"wrapper      : {t*1e3:8.2f} ms {flops/t/1e12:6.1f} TF/s", flush=True)

    for bq, bk, mode in [
        (1024, 1024, "base"),
        (1024, 1024, "prescale"),
        (1024, 1024, "bf16exp"),
        (1024, 1024, "prescale_bf16exp"),
        (1024, 1024, "noexp"),
        (768, 1536, "base"),
        (768, 1536, "prescale_bf16exp"),
        (512, 2048, "base"),
    ]:
        t = timeit(lambda a, b, c: run_variant(a, b, c, bq, bk, mode), q, k, v)
        got = np.asarray(run_variant(q, k, v, bq, bk, mode), np.float32)
        err = (np.abs(got - ref).max() if mode != "noexp" else float("nan"))
        print(f"{mode:12s} ({bq},{bk}): {t*1e3:8.2f} ms {flops/t/1e12:6.1f} TF/s "
              f"max|d-base|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
